"""Config-3 (TrPi2018 GRB) cross-sampler discrepancy diagnosis.

VERDICT r4 #1: config 3's NS-vs-tempered-MCMC parity sits at
JS 0.0125 > 0.01 (log10_E0 / log10_n0 / thetaCore — the degenerate
trio) with MCMC R-hat 1.09. This script determines WHICH sampler is
biased by triangulating three posteriors on the identical likelihood:

  A. NS at the parity settings   (nlive=512,  walks=16)  — the failer
  B. NS at production settings   (nlive=2048, walks=32)  — 8x mixing
  C. tempered MCMC, long budget  (temps=6, t_max=64, 20k sweeps)

If A->B drifts toward C, the NS run was under-mixed (fix: raise the
parity-script settings). If B stays on A and C moves with more budget,
the MCMC ladder was unconverged despite R-hat 1.09.

Run: python scripts/diag_config3.py   (on the TPU; ~70 min)
Writes artifacts/diag_config3.json + per-posterior npz files.
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
    "parity_cross_sampler", os.path.join(REPO, "scripts",
                                         "parity_cross_sampler.py"))
parity = importlib.util.module_from_spec(spec)
spec.loader.exec_module(parity)

OUT = os.path.join(REPO, "artifacts", "diag_config3.json")
KEYS = ["log10_E0", "thetaCore", "inclination_EM", "log10_n0", "p",
        "log10_epsilon_e", "log10_epsilon_B", "timeshift"]


def summarize(post):
    return {k: {"mean": round(float(np.mean(post[k])), 5),
                "std": round(float(np.std(post[k])), 5)}
            for k in KEYS if k in post}


def save_post(tag, post):
    np.savez(os.path.join(REPO, "artifacts", f"diag_config3_{tag}.npz"),
             **{k: np.asarray(v) for k, v in post.items()})


def load_cached(tag):
    """Stage results persist as npz so a transport hang in stage N never
    re-pays stages 1..N-1 (the axon tunnel killed a 2-minute MCMC
    dispatch on the first attempt)."""
    path = os.path.join(REPO, "artifacts", f"diag_config3_{tag}.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def run_ns(tag, nlive, walks, n_delete):
    import jax
    from nmma_tpu.inference import NestedSamplerConfig
    cached = load_cached(tag)
    if cached is not None:
        print(f"{tag}: cached", flush=True)
        return cached, json.load(open(OUT)).get(tag, {"cached": True})
    jax.clear_caches()
    ana = parity._config3()
    ana.config.sampler = NestedSamplerConfig(
        nlive=nlive, n_delete=n_delete, walks=walks, dlogz=0.3,
        chunk_size=5)
    ana.config.label = f"diag_{tag}"
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
        return cached, json.load(open(OUT)).get(tag, {"cached": True})
    jax.clear_caches()
    ana = parity._config3()
    ana.config.label = f"diag_{tag}"
    t0 = time.time()
    post = ana.run_mcmc(EnsembleMCMCConfig(
        seed=ana.config.sampler.seed + 2, **settings))
    wall = time.time() - t0
    save_post(tag, post)
    return post, {"wall_s": round(wall, 1),
                  "max_rhat": round(float(np.nanmax(ana.mcmc_result.rhat)),
                                    4),
                  "acceptance": round(float(ana.mcmc_result.acceptance), 3),
                  "summary": summarize(post)}


def main():
    from nmma_tpu.post_processing.parity import posterior_js_divergences
    report = {}

    post_a, report["ns512"] = run_ns("ns512", 512, 16, 64)
    _write(report)
    post_b, report["ns2048"] = run_ns("ns2048", 2048, 32, 256)
    _write(report)
    # chunk_sweeps=100: at temps=6 x 256 walkers a 500-sweep chunk is a
    # ~2-minute single device execution — past the remote transport's
    # tolerance (it hung exactly there on the first attempt); 100-sweep
    # chunks keep each dispatch ~25 s
    post_c, report["mcmc_long"] = run_mcmc(
        "mcmc_long", walkers=256, sweeps=20000, burn_frac=0.5, thin=8,
        temps=6, t_max=64.0, chunk_sweeps=100)
    _write(report)

    sampled = [k for k in KEYS if k in post_a and np.std(post_a[k]) > 0]
    for name, (x, y) in {
            "js_ns512_vs_ns2048": (post_a, post_b),
            "js_ns512_vs_mcmc": (post_a, post_c),
            "js_ns2048_vs_mcmc": (post_b, post_c)}.items():
        js = posterior_js_divergences(x, y, sampled)
        report[name] = {k: round(float(v), 5) for k, v in js.items()}
        report[name + "_max"] = round(float(max(js.values())), 5)
    _write(report)
    print(json.dumps(report, indent=2))


def _write(report):
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
