"""Formal attribution of the GW170817 6 GHz chi2 excess (VERDICT r4 #6).

The sampled-systematic fit (scripts/fit_gw170817_sampled_syst.py) takes
6 GHz from chi2/dof 6.12 (raw) to 1.77 (posterior-median em_syserr =
0.19 mag) — still above the 1.5 criterion. This script closes the loop
the other way allowed by the criterion ("met or formally attributed"):
it recomputes the per-band chi2/dof at the SAME bestfit point while
excluding exactly the epochs pinned as data-internally inconsistent by
tests/test_gw170817_data_consistency.py:

- the 149.3 d 6 GHz point, which is BRIGHTER than contemporaneous
  3 GHz where any F_nu ~ nu^-0.58 spectrum demands it be ~0.44 mag
  fainter (no nu^beta afterglow model can fit it together with 3 GHz);
- the worse member of the duplicated 162.9 d epoch (two points, same
  timestamp, 0.30 mag apart — no single model value fits both; the
  pair's irreducible chi2 is dmag^2/(s1^2+s2^2) regardless of model).

Runs entirely on CPU from the committed bestfit
(outdir_grb/gw170817_syst_bestfit_params.json) — a single forward-model
eval, no sampling, safe to run alongside the TPU queue.

Run: JAX_PLATFORMS=cpu python scripts/attribute_gw170817_6ghz.py
Writes artifacts/gw170817_attribution.json.
"""

import json
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BESTFIT = os.path.join(REPO, "outdir_grb", "gw170817_syst_bestfit_params.json")
SYST = os.path.join(REPO, "artifacts", "gw170817_sampled_syst.json")
OUT = os.path.join(REPO, "artifacts", "gw170817_attribution.json")


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from fit_gw170817_sampled_syst import build

    ana = build()
    with open(BESTFIT) as f:
        best = json.load(f)
    with open(SYST) as f:
        syst_med = json.load(f)["em_syserr_posterior"]["median"]

    params = {k: jnp.asarray(v) for k, v in best.items()
              if k != "log_likelihood"}
    obs_t, mags = jax.jit(ana.model.__call__)(params)
    obs_t, mags = np.asarray(obs_t), np.asarray(mags)

    report = {"em_syserr_median": syst_med, "bands": {}}
    for i, f in enumerate(ana.filters):
        d = ana.data_dict[f]
        tt = np.asarray(d["time"])
        mm = np.asarray(d["mag"])
        ee = np.asarray(d["mag_error"])
        det = np.isfinite(ee)
        tt, mm, ee = tt[det], mm[det], ee[det]
        mod = np.interp(np.log(tt), np.log(obs_t), mags[i])
        sig2 = ee ** 2 + syst_med ** 2
        chi2 = (mod - mm) ** 2 / sig2
        row = {"n": int(tt.size),
               "chi2_dof_all": round(float(chi2.mean()), 3)}
        if f == "radio-6GHz":
            tday = tt        # data_dict times are already trigger-shifted
            keep = np.ones(tt.size, bool)
            # (1) the pinned spectral-index violator at 149.3 d
            i149 = int(np.argmin(np.abs(tday - 149.3)))
            assert abs(tday[i149] - 149.3) < 1.0, tday[i149]
            keep[i149] = False
            # (2) the worse member of the duplicated 162.9 d epoch
            order = np.argsort(tday)
            dup = np.where(np.diff(tday[order]) < 1e-6)[0]
            assert dup.size >= 1
            a, b = order[dup[0]], order[dup[0] + 1]
            worse = a if chi2[a] > chi2[b] else b
            keep[worse] = False
            row["excluded_days"] = [round(float(tday[i149]), 1),
                                    round(float(tday[worse]), 1)]
            row["chi2_dof_excl_pinned"] = round(float(chi2[keep].mean()), 3)
            row["excluded_chi2_share"] = round(
                float(chi2[~keep].sum() / chi2.sum()), 3)
        report["bands"][f] = row

    vals = [r.get("chi2_dof_excl_pinned", r["chi2_dof_all"])
            for r in report["bands"].values()]
    report["pass_all_bands_le_1p5_excl_pinned"] = bool(max(vals) <= 1.5)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
