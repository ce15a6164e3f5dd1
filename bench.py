"""Headline benchmark: SVD-surrogate likelihood evals/sec/chip on AT2017gfo.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The benchmarked quantity is the BASELINE headline config (config 2): the
full photometric log-likelihood through a Bu2019lm-family SVD surrogate
(trained offline from the bundled bulla grid — scripts/
train_bench_surrogate.py) on real AT2017gfo photometry, evaluated as a
jitted batch — the hot loop of EM parameter estimation (SURVEY.md §3.1).
``vs_baseline`` compares against a float64 NumPy per-theta implementation
of the same surrogate eval (normalize -> MLP -> V.c -> denorm -> interp)
on this host's CPU — the stand-in for the reference's keras-``model(x)``
single-theta eval inside pymultinest (em/lightcurve_generation.py:180-217).
The Me2017 analytic-kernel rate (round-1 headline) rides along in
``extra``.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# the remote toolchain's FIRST Mosaic (Pallas) compile in a process has
# been observed to take 170-750 s during service upgrades; the benchmark
# defaults to the XLA Me2017 form (~25% slower steady-state, seconds to
# compile) so the run is robust. NMMA_TPU_BENCH_PALLAS=1 restores the
# Pallas kernel.
if not os.environ.get("NMMA_TPU_BENCH_PALLAS"):
    os.environ.setdefault("NMMA_TPU_DISABLE_PALLAS", "1")

DATA = "/root/reference/example_files/lightcurves/AT2017gfo.dat"
ME2017_PRIOR = "/root/reference/priors/Me2017.prior"
SVD_ARTIFACT = os.path.join(REPO, "artifacts", "Bu2019lm_sparse_svd.npz")
TRIGGER_MJD = 57982.5285236896
BATCH = 8192   # largest correct single dispatch (see EMAnalysis.
# MAX_DISPATCH_BATCH): past ~2 GiB the dense interp buffer corrupts on
# the current TPU runtime
TIMED_ITERS = 10

SVD_PRIOR_TEXT = """\
log10_mej_dyn = Uniform(minimum=-3., maximum=-1.)
log10_mej_wind = Uniform(minimum=-2., maximum=-0.5)
luminosity_distance = Uniform(minimum=1., maximum=200.)
timeshift = Uniform(minimum=-0.2, maximum=0.2)
"""


def build_me2017_analysis():
    from nmma_tpu.analysis import EMAnalysis, EMAnalysisConfig
    cfg = EMAnalysisConfig(
        model="Me2017", prior_file=ME2017_PRIOR, light_curve_data=DATA,
        trigger_time=TRIGGER_MJD, data_tmax=12.0, error_budget=1.0,
    )
    return EMAnalysis(cfg)


def build_svd_analysis():
    import tempfile

    from nmma_tpu.analysis import EMAnalysis, EMAnalysisConfig
    from nmma_tpu.models.svd import SVDModelData, make_svd_source_model
    svd = SVDModelData.load(SVD_ARTIFACT)
    source = make_svd_source_model("Bu2019lm_sparse_bench", svd)
    with tempfile.NamedTemporaryFile("w", suffix=".prior",
                                     delete=False) as f:
        f.write(SVD_PRIOR_TEXT)
        prior_path = f.name
    cfg = EMAnalysisConfig(
        model=source.name, prior_file=prior_path, light_curve_data=DATA,
        trigger_time=TRIGGER_MJD, data_tmax=12.0, error_budget=1.0,
        filters=[f for f in svd.filters],
    )
    return EMAnalysis(cfg), svd


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


def bench_cpu_me2017_baseline(ana, n_evals=8):
    """f64 NumPy shell-model kernel (reference-style per-theta eval)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_kilonova_models import _me2017_oracle
    t_day = np.geomspace(0.01, 14.0, 150)
    nu = np.asarray(ana.model.nu_0s)
    t0 = time.perf_counter()
    for i in range(n_evals):
        _me2017_oracle(t_day, -1.5 + 0.01 * i, -1.0, 3.0, 0.5, nu)
    return n_evals / (time.perf_counter() - t0)


def bench_cpu_svd_baseline(svd, n_evals=200):
    """f64 NumPy per-theta surrogate eval: the reference hot path
    (normalize -> 2-layer MLP -> V[:, :n].c -> denorm -> interp)."""
    va = np.asarray(svd.va, dtype=np.float64)
    mins = np.asarray(svd.mins, dtype=np.float64)
    maxs = np.asarray(svd.maxs, dtype=np.float64)
    w1 = np.asarray(svd.w1, dtype=np.float64)
    b1 = np.asarray(svd.b1, dtype=np.float64)
    w2 = np.asarray(svd.w2, dtype=np.float64)
    b2 = np.asarray(svd.b2, dtype=np.float64)
    pmin = np.asarray(svd.param_mins, dtype=np.float64)
    pmax = np.asarray(svd.param_maxs, dtype=np.float64)
    tt = np.asarray(svd.tt, dtype=np.float64)
    t_obs = np.geomspace(0.3, 12.0, 40)
    rng = np.random.default_rng(1)
    thetas = rng.uniform(pmin, pmax, (n_evals, len(pmin)))

    t0 = time.perf_counter()
    for theta in thetas:
        x = (theta - pmin) / (pmax - pmin)
        for fi in range(va.shape[0]):       # per-filter, like the reference
            h = np.maximum(x @ w1[fi] + b1[fi], 0.0)
            c = h @ w2[fi] + b2[fi]
            m = va[fi] @ c
            m = m * (maxs[fi] - mins[fi]) + mins[fi]
            np.interp(t_obs, tt, m)
    return n_evals / (time.perf_counter() - t0)


def main():
    svd_ana, svd = build_svd_analysis()
    rate, sample = bench_tpu_rate(svd_ana)
    finite_frac = float(np.isfinite(sample[sample > -1e29]).size) / \
        len(sample)
    try:
        cpu_rate = bench_cpu_svd_baseline(svd)
    except Exception:
        cpu_rate = float("nan")

    me_ana = build_me2017_analysis()
    me_rate, me_sample = bench_tpu_rate(me_ana)
    try:
        me_cpu = bench_cpu_me2017_baseline(me_ana)
    except Exception:
        me_cpu = float("nan")

    result = {
        "metric": "bu2019lm_svd_likelihood_evals_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "evals/s",
        "vs_baseline": round(rate / cpu_rate, 2)
        if np.isfinite(cpu_rate) else None,
        "extra": {
            "batch": BATCH,
            "cpu_f64_numpy_rate": round(cpu_rate, 2),
            "finite_fraction": round(finite_frac, 3),
            "n_filters": len(svd.filters),
            "me2017_evals_per_sec": round(me_rate, 2),
            "me2017_vs_cpu": round(me_rate / me_cpu, 2)
            if np.isfinite(me_cpu) else None,
            "backend": __import__("jax").default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
