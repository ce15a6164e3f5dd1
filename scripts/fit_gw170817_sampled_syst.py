"""GW170817 afterglow PE with a SAMPLED systematic (VERDICT r4 #6).

The reference-faithful closure of the 6 GHz chi2 question: instead of a
fixed 0.1-mag systematic (scripts/fit_gw170817_pinned.py), sample
``em_syserr`` the way the reference's EM likelihood does
(nmma/em/em_likelihood.py:214-222 — sigma_tot^2 = sigma_data^2 +
sigma_sys^2 with sigma_sys a free parameter; nmma/em/systematics.py:
212-263). Geometry stays pinned to the VLBI values (Mooley et al. 2018,
Ghirlanda et al. 2019), so any residual excess must be absorbed by the
sampled systematic or attributed to the data (the pinned 3-6 GHz
internal inconsistency, tests/test_gw170817_data_consistency.py).

Reports the em_syserr posterior and per-band chi2/dof at the best-fit
point with and without the posterior-median systematic. Criterion
(VERDICT r3 #1b): all three bands <= 1.5 with the sampled systematic.

Run on the TPU: python scripts/fit_gw170817_sampled_syst.py
Writes artifacts/gw170817_sampled_syst.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRIGGER = 57982.5285236896
DATA = ("/root/reference/example_files/lightcurves/"
        "AT2017gfo_GRB170817A_corrected.dat")
OUT = os.path.join(REPO, "artifacts", "gw170817_sampled_syst.json")

PRIOR_TEXT = """\
log10_E0 = Uniform(minimum=49.5, maximum=54.5)
log10_n0 = Uniform(minimum=-6.0, maximum=0.5)
p = Uniform(minimum=2.02, maximum=2.6)
log10_epsilon_e = Uniform(minimum=-4.0, maximum=-0.2)
log10_epsilon_B = Uniform(minimum=-6.5, maximum=-0.5)
em_syserr = Uniform(minimum=0.0, maximum=1.0)
inclination_EM = 0.40
thetaCore = 0.066
thetaWing = 0.47
xi_N = 1.0
luminosity_distance = 40.0
timeshift = 0.0
"""


def build():
    from nmma_tpu.analysis import EMAnalysis, EMAnalysisConfig
    from nmma_tpu.inference import NestedSamplerConfig
    from nmma_tpu.priors import parse_prior_dict
    cfg = EMAnalysisConfig(
        model="TrPi2018", light_curve_data=DATA, trigger_time=TRIGGER,
        data_tmin=8.0, data_tmax=750.0,
        filters=["radio-3GHz", "radio-6GHz", "X-ray-1keV"],
        tmin=8.0, tmax=760.0, n_tsteps=64, timescale="log",
        error_budget=0.0,            # NO fixed budget: em_syserr is sampled
        outdir=os.path.join(REPO, "outdir_grb"), label="gw170817_syst",
        sampler=NestedSamplerConfig(nlive=512, n_delete=64, walks=16,
                                    dlogz=0.3, chunk_size=5))
    ana = EMAnalysis(cfg, priors=parse_prior_dict(PRIOR_TEXT))
    ana.MAX_DISPATCH_BATCH = 1024
    return ana


def bestfit_mags(ana, bestfit):
    """Forward-model mags at a parameter point (jitted: eager op-by-op
    dispatch on the axon remote backend takes seconds per op — see
    .claude/skills/verify/SKILL.md)."""
    import jax
    import jax.numpy as jnp
    params = {k: jnp.asarray(v) for k, v in bestfit.items()
              if k != "log_likelihood"}
    obs_t, mags = jax.jit(ana.model.__call__)(params)
    return np.asarray(obs_t), np.asarray(mags)


def per_band_chi2(ana, obs_t, mags, syst_mag):
    """Host-side per-band chi2/dof at a parameter point (detections only)."""
    out = {}
    for i, f in enumerate(ana.filters):
        d = ana.data_dict[f]
        tt = np.asarray(d["time"])
        mm = np.asarray(d["mag"])
        ee = np.asarray(d["mag_error"])
        det = np.isfinite(ee)
        mod = np.interp(np.log(tt[det]), np.log(obs_t), mags[i])
        sig2 = ee[det] ** 2 + syst_mag ** 2
        out[f] = round(float(np.mean((mod - mm[det]) ** 2 / sig2)), 2)
    return out


def main():
    ana = build()
    t0 = time.time()
    ana.run(verbose=True, checkpoint=False)
    wall = time.time() - t0
    post = ana.posterior_samples(rng=np.random.default_rng(0))
    best = ana.bestfit_parameters()
    q = np.percentile(post["em_syserr"], [5, 50, 95])
    syst_med = float(q[1])
    obs_t, mags = bestfit_mags(ana, best)
    report = {
        "wall_s": round(wall, 1),
        "logz": round(float(ana.result.logz), 2),
        "em_syserr_posterior": {"p5": round(float(q[0]), 4),
                                "median": round(syst_med, 4),
                                "p95": round(float(q[2]), 4)},
        "bestfit": {k: round(float(v), 3) for k, v in best.items()},
        "chi2_dof_raw": per_band_chi2(ana, obs_t, mags, 0.0),
        "chi2_dof_with_median_syst": per_band_chi2(ana, obs_t, mags,
                                                   syst_med),
        "posterior_medians": {
            k: round(float(np.median(v)), 3) for k, v in post.items()
            if k != "log_likelihood" and np.std(v) > 0},
    }
    report["pass_all_bands_le_1p5"] = bool(
        max(report["chi2_dof_with_median_syst"].values()) <= 1.5)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
