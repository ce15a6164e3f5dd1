"""Likelihood-free inference tests: flow correctness + amortized posterior
recovery on simulated Me2017 light curves (tiny budget)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_flow_density_integrates(rng):
    """Flow log_prob approximates the training density after fitting a
    simple 2D Gaussian (sanity: mean NLL near analytic entropy)."""
    from nmma_tpu.mlmodel.flows import MaskedAutoregressiveFlow
    import optax

    dim = 2
    flow = MaskedAutoregressiveFlow(dim=dim, n_transforms=4, hidden=32)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.normal([1.0, -2.0], [0.5, 2.0], (4000, dim)),
                    dtype=jnp.float32)
    params = flow.init(key, x[:2], method=MaskedAutoregressiveFlow.log_prob)
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return -jnp.mean(flow.apply(
                p, x, method=MaskedAutoregressiveFlow.log_prob))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(400):
        params, state, loss = step(params, state)
    # analytic differential entropy of the target
    entropy = 0.5 * np.sum(np.log(2 * np.pi * np.e * np.array([0.5, 2.0])**2))
    assert abs(float(loss) - entropy) < 0.35, (float(loss), entropy)

    # sampling round-trip: moments match the target
    samples = flow.apply(params, jax.random.PRNGKey(1), 4000,
                         method=MaskedAutoregressiveFlow.sample)
    s = np.asarray(samples)
    np.testing.assert_allclose(s.mean(0), [1.0, -2.0], atol=0.3)
    np.testing.assert_allclose(s.std(0), [0.5, 2.0], rtol=0.35)


def test_amortized_posterior_recovers_parameter(rng):
    """Train q(theta | lc) on simulated Me2017 pairs; the posterior for a
    held-out light curve must centre near its true parameter."""
    from nmma_tpu.mlmodel import train_flow_posterior
    from nmma_tpu.models import DetectorLightCurveModel

    filters = ["ztfg", "ztfr"]
    t_grid = np.geomspace(0.3, 10.0, 32)
    model = DetectorLightCurveModel("Me2017", filters, sample_times=t_grid)

    def simulate(log10_mej, log10_kappa_r, key_noise):
        params = dict(log10_mej=log10_mej, log10_vej=-1.1, beta=3.0,
                      log10_kappa_r=log10_kappa_r,
                      luminosity_distance=40.0, timeshift=0.0)
        _, mags = model(params)
        return np.asarray(mags) + key_noise

    n_train = 300
    thetas = np.column_stack([rng.uniform(-2.5, -1.0, n_train),
                              rng.uniform(-0.5, 1.5, n_train)])
    lcs = np.stack([
        simulate(t[0], t[1], rng.normal(0, 0.05, (2, 32)))
        for t in thetas])

    posterior = train_flow_posterior(
        thetas, lcs, ["log10_mej", "log10_kappa_r"], n_transforms=4,
        hidden=48, n_epochs=1500, batch_size=256, verbose=False)

    truth = (-1.6, 0.6)
    lc_obs = simulate(*truth, rng.normal(0, 0.05, (2, 32)))
    post = posterior.sample(jax.random.PRNGKey(5), 2000, lc_obs)
    med_mej = np.median(post["log10_mej"])
    assert abs(med_mej - truth[0]) < 0.25, med_mej
    # posterior is informative (much narrower than the prior range)
    assert np.std(post["log10_mej"]) < 0.3
    # (log10_kappa_r is weakly identified from two optical bands alone;
    # no assertion on it)


def test_neuralnet_sampler_cli(tmp_path, rng):
    """--sampler neuralnet end to end: amortized flow posterior recovers
    the injected parameter region on a tiny Me2017 setup (reference
    nnanalysis path, em/analysis.py:176-307)."""
    import jax
    import numpy as np

    from nmma_tpu.cli.lightcurve_analysis import main
    from nmma_tpu.injections import create_light_curve_data

    truth = dict(log10_mej=-1.4, log10_vej=-1.0, beta=3.0,
                 log10_kappa_r=0.5, luminosity_distance=40.0, timeshift=0.0)
    data = create_light_curve_data(
        truth, "Me2017", ["ztfg", "ztfr"],
        sample_times=np.linspace(0.5, 8.0, 12), seed=3,
        injection_error_budget=0.1)
    lines = []
    for f, d in data.items():
        for t, m, e in zip(d["time"], d["mag"], d["mag_error"]):
            if np.isfinite(m) and np.isfinite(e):
                lines.append(f"{59000 + t} {f} {m:.4f} {e:.3f}")
    (tmp_path / "lc.dat").write_text("\n".join(lines) + "\n")
    prior = tmp_path / "p.prior"
    prior.write_text(
        "log10_mej = Uniform(minimum=-2.5, maximum=-0.8)\n"
        "log10_vej = -1.\nbeta = 3.\nlog10_kappa_r = 0.5\n"
        "luminosity_distance = 40.\ntimeshift = 0.\n")
    ana = main([
        "--model", "Me2017", "--outdir", str(tmp_path), "--label", "nn",
        "--prior", str(prior), "--light-curve-data", str(tmp_path / "lc.dat"),
        "--trigger-time", "59000", "--tmin", "0.1", "--tmax", "10",
        "--em-nsteps", "48", "--sampler", "neuralnet",
    ])
    out = np.load(tmp_path / "nn_result.npz")
    mej = out["posterior_log10_mej"]
    assert len(mej) == 20000
    # the amortized posterior concentrates around the truth
    assert abs(np.median(mej) - truth["log10_mej"]) < 0.35, np.median(mej)
    assert np.std(mej) < 0.45
