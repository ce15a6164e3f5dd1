"""Config-4 (GRB211211A joint KN+GRB) cross-sampler discrepancy diagnosis.

Round-5 state: the converged-recipe parity re-run
(scripts/parity_cross_sampler45.py, artifacts/parity_cross_sampler.json)
still fails on the kilonova power-law index ``beta``: js 0.01524 vs
floor 0.00185 at MCMC R-hat 1.111 (beta's own R-hat 1.076) — while
every other parameter dropped 2-4x from the short-ladder first pass
(beta 0.0171 -> 0.0152, p 0.0282 -> 0.0058, thetaCore 0.0127 -> 0.0064).
A beta JS that barely moves as the MCMC converges everywhere else needs
the config-3 triangulation (scripts/diag_config3.py) to say WHICH
sampler owns it:

  A. NS at the parity settings   (nlive=1024, walks=16)  — reused from
     the parity run's saved posterior CSV when present
  B. NS at production settings   (nlive=2048, walks=32)
  C. tempered MCMC, doubled budget (128 walkers x 6 temps x 48k sweeps)

If A->B drifts toward C on beta, the NS was under-resolved (config-3's
failure mode); if B stays on A and C keeps moving with budget, the MCMC
ladder still hasn't converged the KN sector despite its R-hat.

Run: python scripts/diag_config4.py   (on the TPU; ~2 h)
Writes artifacts/diag_config4.json + per-posterior npz; if the
B-vs-C pair passes the parity criterion, refreshes the config-4 row in
artifacts/parity_cross_sampler.json with the converged-pair evidence.
"""

import importlib.util
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "parity_cross_sampler45", os.path.join(REPO, "scripts",
                                           "parity_cross_sampler45.py"))
parity = importlib.util.module_from_spec(spec)
spec.loader.exec_module(parity)

OUT = os.path.join(REPO, "artifacts", "diag_config4.json")
KEYS = ["log10_mej", "log10_vej", "beta", "log10_kappa_r", "log10_E0",
        "thetaCore", "inclination_EM", "log10_n0", "p",
        "log10_epsilon_e", "log10_epsilon_B"]
PARITY_CSV = os.path.join(REPO, "outdir_grb211211a",
                          "parity_config4_posterior_samples.csv")


def summarize(post):
    return {k: {"mean": round(float(np.mean(post[k])), 5),
                "std": round(float(np.std(post[k])), 5)}
            for k in KEYS if k in post}


def save_post(tag, post):
    np.savez(os.path.join(REPO, "artifacts", f"diag_config4_{tag}.npz"),
             **{k: np.asarray(v) for k, v in post.items()})


def load_cached(tag):
    path = os.path.join(REPO, "artifacts", f"diag_config4_{tag}.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _report_entry(tag):
    try:
        return json.load(open(OUT)).get(tag, {"cached": True})
    except Exception:
        return {"cached": True}


def load_parity_ns():
    """The parity run's NS posterior (nlive=1024) — stage A for free."""
    arr = np.genfromtxt(PARITY_CSV, names=True, delimiter=",")
    return {k: np.asarray(arr[k]) for k in arr.dtype.names}


def run_ns(tag, nlive, walks, n_delete):
    import jax
    from nmma_tpu.inference import NestedSamplerConfig
    cached = load_cached(tag)
    if cached is not None:
        print(f"{tag}: cached", flush=True)
        return cached, _report_entry(tag)
    jax.clear_caches()
    ana = parity._config4()
    ana.config.sampler = NestedSamplerConfig(
        nlive=nlive, n_delete=n_delete, walks=walks, dlogz=0.3,
        chunk_size=5)
    ana.config.label = f"diag4_{tag}"
    t0 = time.time()
    ana.run(verbose=True, checkpoint=False)
    wall = time.time() - t0
    post = ana.posterior_samples(rng=np.random.default_rng(0))
    save_post(tag, post)
    return post, {"wall_s": round(wall, 1),
                  "logz": round(float(ana.result.logz), 3),
                  "logz_err": round(float(ana.result.logz_err), 3),
                  "summary": summarize(post)}


def run_mcmc(tag, **settings):
    import jax
    from nmma_tpu.inference import EnsembleMCMCConfig
    cached = load_cached(tag)
    if cached is not None:
        print(f"{tag}: cached", flush=True)
        return cached, _report_entry(tag)
    jax.clear_caches()
    ana = parity._config4()
    ana.config.label = f"diag4_{tag}"
    t0 = time.time()
    post = ana.run_mcmc(EnsembleMCMCConfig(
        seed=ana.config.sampler.seed + 2, **settings))
    wall = time.time() - t0
    save_post(tag, post)
    rhat = np.atleast_1d(ana.mcmc_result.rhat)
    return post, {"wall_s": round(wall, 1),
                  "max_rhat": round(float(np.nanmax(rhat)), 4),
                  "rhat_per_param": {
                      n: round(float(r), 4)
                      for n, r in zip(ana.priors.sampled_names, rhat)},
                  "summary": summarize(post)}


def main():
    from nmma_tpu.post_processing.parity import posterior_js_divergences
    report = {}

    if os.path.exists(PARITY_CSV):
        post_a = load_parity_ns()
        report["ns1024"] = {"source": "parity_config4_posterior_samples.csv",
                            "summary": summarize(post_a)}
    else:
        post_a, report["ns1024"] = run_ns("ns1024", 1024, 16, 128)
    _write(report)
    post_b, report["ns2048"] = run_ns("ns2048", 2048, 32, 256)
    _write(report)
    # chunk_sweeps=100 keeps each device dispatch ~25 s (the axon
    # transport kills ~2-minute single executions; see diag_config3.py)
    post_c, report["mcmc_48k"] = run_mcmc(
        "mcmc_48k", walkers=128, sweeps=48000, burn_frac=0.5, thin=16,
        temps=6, t_max=64.0, chunk_sweeps=100)
    _write(report)

    sampled = [k for k in KEYS if k in post_a and np.std(post_a[k]) > 0]
    pairs = {
        "js_ns1024_vs_ns2048": (post_a, post_b),
        "js_ns1024_vs_mcmc48k": (post_a, post_c),
        "js_ns2048_vs_mcmc48k": (post_b, post_c)}
    # cross-MCMC convergence evidence: the parity run saved its own
    # tempered-MCMC posterior (24k sweeps, independent seed/ladder) —
    # two independent MCMCs agreeing at the floor is stronger than an
    # R-hat threshold (pre-check: short-vs-long ladders already agree at
    # js(beta)=0.0011 while BOTH sit 0.010-0.015 from the NS)
    mcmc_parity_csv = os.path.join(
        REPO, "outdir_grb211211a", "parity_config4_mcmc_posterior_samples.csv")
    if os.path.exists(mcmc_parity_csv):
        arr = np.genfromtxt(mcmc_parity_csv, names=True, delimiter=",")
        post_m24 = {k: np.asarray(arr[k]) for k in arr.dtype.names}
        pairs["js_mcmc24k_vs_mcmc48k"] = (post_m24, post_c)
    for name, (x, y) in pairs.items():
        js = posterior_js_divergences(x, y, sampled)
        report[name] = {k: round(float(v), 5) for k, v in js.items()}
        report[name + "_max"] = round(float(max(js.values())), 5)
    # the criterion pair: production NS vs the longest MCMC
    floor = parity._floor(post_c, post_b, sampled)
    floor_max = float(max(floor.values()))
    js_bc_max = report["js_ns2048_vs_mcmc48k_max"]
    report["js_floor_max"] = round(floor_max, 5)
    report["pass_js_lt_0p01"] = bool(js_bc_max < max(0.01, 2 * floor_max))
    _write(report)

    if report["pass_js_lt_0p01"]:
        row = {"config": 4,
               "ns_wall_s": report["ns2048"].get("wall_s"),
               "mcmc_wall_s": report["mcmc_48k"].get("wall_s"),
               "mcmc_max_rhat": report["mcmc_48k"].get("max_rhat"),
               "logz": report["ns2048"].get("logz"),
               "js_per_param": report["js_ns2048_vs_mcmc48k"],
               "js_max": js_bc_max,
               "js_floor_max": round(floor_max, 5),
               "pass_js_lt_0p01": True,
               "note": "converged pair from diag_config4.py: NS@nlive=2048"
                       " vs tempered MCMC 128x6x48k"}
        parity._merge_write(row)
    print(json.dumps(report, indent=2))


def _write(report):
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
