"""Cross-sampler posterior parity for BASELINE configs 4-5 (VERDICT r4 #2).

Extends scripts/parity_cross_sampler.py to the joint paths so that every
BASELINE config carries posterior-level second-sampler evidence:

  config 4 — joint KN+GRB PE on the real GRB211211A photometry
             (Me2017 + TrPi2018 combined model, 10 free parameters),
             NS vs parallel-tempered ensemble MCMC on the identical
             jitted likelihood.
  config 5 — joint GW+EM+EOS BNS inference (IMRPhenomD_NRTidalv2 on
             H1/L1/V1 injected strain + Bu2019lm_sparse kilonova + EOS
             set, 5 free parameters) through the SAME data dump the
             two-stage CLI produces, NS vs tempered MCMC.

Each row reports per-parameter Jensen-Shannon divergence plus the JS
estimator noise floor at matched sample counts (the finite-sample JS of
two halves of the SAME chain — config passes when js_max < max(0.01,
2*floor), the round-4 criterion).

Run on the TPU:
    python scripts/parity_cross_sampler45.py [4|5|all]
Appends rows to artifacts/parity_cross_sampler.json.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "parity_cross_sampler.json")


def _config4():
    """GRB211211A joint KN+GRB analysis (EMAnalysis surface)."""
    from nmma_tpu.analysis import EMAnalysis, EMAnalysisConfig
    from nmma_tpu.inference import NestedSamplerConfig
    from nmma_tpu.io import load_em_observations, shift_to_trigger_time
    from nmma_tpu.models import get_source_model
    from nmma_tpu.models.combined import make_combined_source_model
    from nmma_tpu.priors import parse_prior_dict

    data = load_em_observations(
        "/root/reference/example_files/lightcurves/GRB211211A.txt")
    trigger = min(np.min(sub["time"]) for sub in data.values()) - 0.05
    data = shift_to_trigger_time(data, trigger)
    make_combined_source_model(
        "Me2017_TrPi2018_parity45",
        [get_source_model("Me2017"), get_source_model("TrPi2018")])
    priors = parse_prior_dict(
        "log10_mej = Uniform(minimum=-3., maximum=-1.)\n"
        "log10_vej = Uniform(minimum=-2., maximum=-0.5)\n"
        "beta = Uniform(minimum=1., maximum=5.)\n"
        "log10_kappa_r = Uniform(minimum=-1., maximum=2.)\n"
        "log10_E0 = Uniform(minimum=47., maximum=53.)\n"
        "thetaCore = Uniform(minimum=0.01, maximum=0.3)\n"
        "thetaWing = 0.3\n"
        "inclination_EM = Uniform(minimum=0., maximum=0.4)\n"
        "log10_n0 = Uniform(minimum=-5., maximum=1.)\n"
        "p = Uniform(minimum=2.01, maximum=2.9)\n"
        "log10_epsilon_e = Uniform(minimum=-3., maximum=-0.3)\n"
        "log10_epsilon_B = Uniform(minimum=-5., maximum=-0.5)\n"
        "xi_N = 1.0\nluminosity_distance = 350.0\ntimeshift = 0.0\n")
    cfg = EMAnalysisConfig(
        model="Me2017_TrPi2018_parity45", trigger_time=0.0,
        tmin=0.02, tmax=40.0, n_tsteps=100, error_budget=1.0,
        outdir=os.path.join(REPO, "outdir_grb211211a"),
        label="parity_config4",
        # nlive 1024 (not 512): the config-3 parity fail was traced to NS
        # under-resolution at nlive=512 (scripts/diag_config3.py) — give
        # the joint config the same resolution headroom
        sampler=NestedSamplerConfig(nlive=1024, n_delete=128, walks=16,
                                    dlogz=0.3, chunk_size=5))
    ana = EMAnalysis(cfg, data=data, priors=priors)
    ana.MAX_DISPATCH_BATCH = 1024
    return ana


def _build_config5_dump():
    """Generation stage of the config-5 joint pipeline (one injected BNS,
    the bench_joint_pe.py setup verbatim)."""
    from nmma_tpu.cli.joint_main import nmma_generation
    from nmma_tpu.injections import write_injection_file
    outdir = tempfile.mkdtemp(prefix="parity45_")
    inj = os.path.join(outdir, "inj.json")
    write_injection_file(inj, {
        "chirp_mass": [1.1977], "mass_ratio": [0.9],
        "luminosity_distance": [40.0], "EOS": [4.2], "ratio_zeta": [0.3],
        "alpha": [5e-5], "theta_jn": [0.4], "phase": [1.3], "psi": [1.5],
        "ra": [3.446], "dec": [-0.408], "geocent_time": [0.0],
        "timeshift": [0.0]})
    prior = os.path.join(outdir, "p.prior")
    with open(prior, "w") as fh:
        fh.write(
            "chirp_mass = Uniform(minimum=1.18, maximum=1.21)\n"
            "mass_ratio = Uniform(minimum=0.6, maximum=1.0)\n"
            "luminosity_distance = Uniform(minimum=10., maximum=100.)\n"
            "EOS = Uniform(minimum=0., maximum=10.)\n"
            "ratio_zeta = Uniform(minimum=0., maximum=0.5)\n"
            "alpha = 5e-5\ntheta_jn = 0.4\nphase = 1.3\n"
            "psi = 1.5\nra = 3.446\ndec = -0.408\ngeocent_time = 0.0\n"
            "timeshift = 0.0\n")
    return nmma_generation([
        "--outdir", outdir, "--label", "parity5",
        "--prior-file", prior, "--injection-file", inj,
        "--eos-data", "/root/reference/nmma/tests/data/eos_macro",
        "--duration", "64.0", "--minimum-frequency", "25.0",
        "--maximum-frequency", "1024.0", "--gw-detectors", "H1,L1,V1",
        "--waveform", "IMRPhenomD_NRTidalv2",
        "--em-model", "Bu2019lm_sparse",
        "--svd-path", os.path.join(REPO, "artifacts",
                                   "Bu2019lm_sparse_svd.npz")])


def _floor(post_mc, post_ns, sampled, seed=1):
    from nmma_tpu.post_processing.parity import posterior_js_divergences
    rng = np.random.default_rng(seed)
    n_ns = len(post_ns[sampled[0]])
    n_mc = len(post_mc[sampled[0]])
    idx = rng.permutation(n_mc)
    cut = min(n_ns, n_mc // 2)
    sub_a = {k: np.asarray(post_mc[k])[idx[:cut]] for k in sampled}
    sub_b = {k: np.asarray(post_mc[k])[idx[cut:]] for k in sampled}
    return posterior_js_divergences(sub_a, sub_b, sampled)


def _row(num, post_ns, post_mc, t_ns, t_mc, rhat, logz, rhat_names=None):
    from nmma_tpu.post_processing.parity import posterior_js_divergences
    from nmma_tpu.post_processing.plotting_routines import plot_multi_corner
    sampled = [k for k, v in post_ns.items()
               if k != "log_likelihood" and np.std(v) > 0
               and k in post_mc and np.std(post_mc[k]) > 0]
    js = posterior_js_divergences(post_ns, post_mc, sampled)
    js_floor = _floor(post_mc, post_ns, sampled)
    plot_multi_corner(
        [post_ns, {k: post_mc[k] for k in sampled}], keys=sampled,
        labels=["nested sampler", "ensemble MCMC"],
        save_path=os.path.join(REPO, "artifacts",
                               f"parity_corner_config{num}.png"))
    floor_max = float(max(js_floor.values()))
    js_max = float(max(js.values()))
    row = {"config": num, "ns_wall_s": round(t_ns, 1),
           "mcmc_wall_s": round(t_mc, 1),
           "mcmc_max_rhat": round(float(np.nanmax(rhat)), 3),
           "logz": round(float(logz), 2),
           "js_per_param": {k: round(float(v), 5) for k, v in js.items()},
           "js_max": round(js_max, 5),
           "js_floor_max": round(floor_max, 5),
           "pass_js_lt_0p01": bool(js_max < max(0.01, 2 * floor_max))}
    if rhat_names is not None:
        row["mcmc_rhat_per_param"] = {
            n: round(float(r), 4) for n, r in zip(rhat_names, np.atleast_1d(rhat))}
    return row


def run_config4():
    import jax

    from nmma_tpu.inference import EnsembleMCMCConfig
    jax.clear_caches()
    ana = _config4()
    t0 = time.time()
    ana.run(verbose=True, checkpoint=False)
    t_ns = time.time() - t0
    post_ns = ana.posterior_samples(rng=np.random.default_rng(0))
    jax.clear_caches()
    t0 = time.time()
    # the short ladder (temps=4, t_max=32, 12k sweeps) left the chains at
    # R-hat 1.232 on this 11-parameter joint posterior; the LONG ladder
    # that converged config 3 (temps=6, t_max=64 — replica exchange over
    # the E0/n0/thetaCore ridge) with doubled sweeps and fewer walkers
    # keeps the eval budget ~1.5x while tripling per-chain length
    post_mc = ana.run_mcmc(EnsembleMCMCConfig(
        seed=ana.config.sampler.seed + 1, walkers=128, sweeps=24000,
        burn_frac=0.5, thin=16, temps=6, t_max=64.0, chunk_sweeps=100))
    t_mc = time.time() - t0
    return _row(4, post_ns, post_mc, t_ns, t_mc,
                ana.mcmc_result.rhat, ana.result.logz,
                rhat_names=ana.priors.sampled_names)


def run_config5():
    import pickle

    import jax
    import jax.numpy as jnp

    from nmma_tpu.cli.joint_main import build_joint_likelihood
    from nmma_tpu.inference import (EnsembleMCMC, EnsembleMCMCConfig,
                                    NestedSampler, NestedSamplerConfig)
    jax.clear_caches()
    dump_path = _build_config5_dump()
    with open(dump_path, "rb") as f:
        dump = pickle.load(f)
    likelihood, priors = build_joint_likelihood(dump)

    def unit_logl(u):
        return likelihood(priors.transform(u))

    batched = jax.vmap(unit_logl)
    ns = NestedSampler(batched, priors.ndim, NestedSamplerConfig(
        nlive=1024, n_delete=128, walks=16, dlogz=0.1, seed=42))
    t0 = time.time()
    res = ns.run(verbose=True)
    t_ns = time.time() - t0
    idx = res.posterior_indices(np.random.default_rng(0))
    post_ns = {k: np.asarray(v) for k, v in jax.jit(priors.transform)(
        jnp.asarray(res.samples_u[idx])).items()}

    jax.clear_caches()
    # 6k sweeps ran in 86 s but left R-hat at 2.47 — the EOS axis is a
    # staircase (the index selects discrete macro tables) that stretch
    # moves cross slowly; the likelihood is cheap here, so buy a 5x
    # longer chain with the long ladder instead of excusing the R-hat
    mc = EnsembleMCMC(batched, priors.ndim, EnsembleMCMCConfig(
        seed=43, walkers=512, sweeps=30000, burn_frac=0.5, thin=16,
        temps=6, t_max=64.0, chunk_sweeps=200))
    t0 = time.time()
    mres = mc.run(verbose=True)
    t_mc = time.time() - t0
    post_mc = {k: np.asarray(v) for k, v in jax.jit(priors.transform)(
        jnp.asarray(mres.samples_u)).items()}
    return _row(5, post_ns, post_mc, t_ns, t_mc,
                mres.rhat, res.logz, rhat_names=priors.sampled_names)


def _merge_write(row):
    existing = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            existing = json.load(f)
        existing = [r for r in existing if r["config"] != row["config"]]
    with open(OUT, "w") as f:
        json.dump(sorted(existing + [row], key=lambda r: r["config"]), f,
                  indent=2)
    print(json.dumps(row), flush=True)
    print(f"wrote {OUT}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("4", "all"):
        _merge_write(run_config4())
    if which in ("5", "all"):
        _merge_write(run_config5())


if __name__ == "__main__":
    main()
