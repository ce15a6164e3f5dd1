"""Headline benchmark: Me2017 likelihood evals/sec/chip on AT2017gfo.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The benchmarked quantity is the full photometric log-likelihood (Me2017
analytic kilonova, 9 observed filters, real AT2017gfo photometry from the
reference's example files) evaluated as a jitted batch — the hot loop of
EM parameter estimation (SURVEY.md §3.1). ``vs_baseline`` compares against
a float64 NumPy implementation of the same shell-model kernel on this
host's CPU, the stand-in for the reference's per-theta NumPy evaluation
inside pymultinest.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DATA = "/root/reference/example_files/lightcurves/AT2017gfo.dat"
PRIOR = "/root/reference/priors/Me2017.prior"
TRIGGER_MJD = 57982.5285236896
BATCH = 4096
TIMED_ITERS = 10


def build_analysis():
    from nmma_tpu.analysis import EMAnalysis, EMAnalysisConfig
    cfg = EMAnalysisConfig(
        model="Me2017", prior_file=PRIOR, light_curve_data=DATA,
        trigger_time=TRIGGER_MJD, data_tmax=12.0, error_budget=1.0,
    )
    return EMAnalysis(cfg)


def bench_tpu_rate(ana):
    import jax
    logl = jax.jit(ana.batched_logl)
    rng = np.random.default_rng(0)
    u = rng.uniform(0.05, 0.95, (BATCH, ana.priors.ndim)).astype(np.float32)
    u = jax.device_put(u)
    # compile + warm up
    jax.block_until_ready(logl(u))
    t0 = time.perf_counter()
    for i in range(TIMED_ITERS):
        # nudge inputs so no caching of results is possible
        out = logl(u + (i + 1) * 1e-6)
    # single-device execution is in-order: a host transfer of the last
    # output syncs the whole queue (block_until_ready is not a reliable
    # barrier for every buffer type on the axon remote backend)
    host_out = np.asarray(out)
    dt = time.perf_counter() - t0
    return BATCH * TIMED_ITERS / dt, host_out


def bench_cpu_baseline(ana, n_evals=8):
    """f64 NumPy shell-model kernel (reference-style per-theta eval)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_kilonova_models import _me2017_oracle
    t_day = np.geomspace(0.01, 14.0, 150)
    nu = np.asarray(ana.model.nu_0s)
    t0 = time.perf_counter()
    for i in range(n_evals):
        _me2017_oracle(t_day, -1.5 + 0.01 * i, -1.0, 3.0, 0.5, nu)
    return n_evals / (time.perf_counter() - t0)


def main():
    ana = build_analysis()
    rate, sample = bench_tpu_rate(ana)
    finite_frac = float(np.isfinite(sample[sample > -1e29]).size) / len(sample)
    try:
        cpu_rate = bench_cpu_baseline(ana)
    except Exception:
        cpu_rate = float("nan")
    result = {
        "metric": "me2017_likelihood_evals_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "evals/s",
        "vs_baseline": round(rate / cpu_rate, 2) if np.isfinite(cpu_rate) else None,
        "extra": {
            "batch": BATCH,
            "cpu_f64_numpy_rate": round(cpu_rate, 2),
            "finite_fraction": round(finite_frac, 3),
            "backend": __import__("jax").default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
