"""Parity of the Pallas GRB EATS kernel (interpret mode) vs the XLA path.

The kernel (ops/pallas_grb.py) must reproduce _eats_stage2_xla to f32
round-off: same hat-basis resampling, same synchrotron branch structure,
same trumpet geometry. Run here in the Pallas interpreter on the CPU
test mesh; the TPU dispatch path is exercised by bench/PE runs.
"""

import jax
import jax.numpy as jnp
import numpy as np

import nmma_tpu.models.grb as G
from nmma_tpu.ops.pallas_grb import eats_flux_pallas


def _stage2_inputs(B=3, seed=0):
    rng = np.random.default_rng(seed)
    t_obs = np.geomspace(0.1, 300.0, 64)
    nu = np.array([1.4e14, 2.4e17, 6e9])
    per = [dict(
        log10_E0=float(rng.uniform(51, 54)),
        thetaCore=float(rng.uniform(0.02, 0.3)),
        thetaWing=float(rng.uniform(0.35, 0.7)),
        inclination_EM=float(rng.uniform(0.0, 0.6)),
        log10_n0=float(rng.uniform(-4, 0)),
        p=float(rng.uniform(2.1, 2.8)),
        log10_epsilon_e=float(rng.uniform(-2, -0.5)),
        log10_epsilon_B=float(rng.uniform(-4, -1)),
        luminosity_distance=float(rng.uniform(30, 300)),
    ) for _ in range(B)]
    rec = []
    orig = G._eats_stage2
    G._eats_stage2 = lambda *a: (rec.append(a), orig(*a))[1]
    try:
        for p in per:
            G.grb_afterglow_flux_density(t_obs, nu, p)
    finally:
        G._eats_stage2 = orig
    t_delay = jnp.stack([a[0] for a in rec])
    tracks = jnp.stack([a[1] for a in rec])
    r_grid = jnp.stack([a[2] for a in rec])
    scal = jnp.stack([a[3] for a in rec])
    return (t_delay, tracks, r_grid, scal) + rec[0][4:]


def test_pallas_eats_parity_interpret():
    (t_delay, tracks, r_grid, scal, log_q, cphi, wphi,
     nu_obs) = _stage2_inputs()
    out_pl = np.asarray(eats_flux_pallas(
        t_delay, tracks, r_grid, scal, log_q, cphi, wphi, nu_obs,
        interpret=True))
    out_xla = np.asarray(jax.vmap(
        G._eats_stage2_xla,
        in_axes=(0, 0, 0, 0, None, None, None, None))(
        t_delay, tracks, r_grid, scal, log_q, cphi, wphi, nu_obs))
    assert out_pl.shape == out_xla.shape
    scale = np.abs(out_xla).max()
    num = np.abs(out_pl - out_xla)
    den = np.maximum(np.abs(out_xla), 1e-6 * scale)
    assert (num / den).max() < 5e-3, (num / den).max()


def test_pallas_chunk_padding():
    """B not a multiple of the chunk size pads and slices correctly."""
    (t_delay, tracks, r_grid, scal, log_q, cphi, wphi,
     nu_obs) = _stage2_inputs(B=3)
    full = np.asarray(eats_flux_pallas(
        t_delay, tracks, r_grid, scal, log_q, cphi, wphi, nu_obs,
        interpret=True))
    one = np.asarray(eats_flux_pallas(
        t_delay[:1], tracks[:1], r_grid[:1], scal[:1], log_q, cphi,
        wphi, nu_obs, interpret=True))
    np.testing.assert_allclose(full[:1], one, rtol=1e-6)


def test_dispatch_broadcasts_unbatched_operands(monkeypatch):
    """Fixed parameters (DeltaFunction priors for inclination/p/z) make
    scal unbatched under vmap; the dispatch must broadcast it and still
    take the Pallas path rather than silently falling back to XLA."""
    import functools
    import nmma_tpu.ops.pallas_grb as PG

    (t_delay, tracks, r_grid, scal, log_q, cphi, wphi,
     nu_obs) = _stage2_inputs(B=2)
    calls = []
    orig = PG.eats_flux_pallas

    def spy(*args, **kw):
        calls.append(args)
        return orig(*args, interpret=True, **kw)

    monkeypatch.setattr(PG, "eats_flux_pallas", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("NMMA_TPU_DISABLE_PALLAS", raising=False)
    monkeypatch.setenv("NMMA_TPU_GRB_PALLAS", "1")   # kernel is opt-in

    scal0 = scal[0]   # unbatched: same z/theta_v/p for the whole batch
    out = jax.vmap(
        functools.partial(G._eats_stage2, log_q=log_q, cphi=cphi,
                          wphi=wphi, nu_obs=nu_obs),
        in_axes=(0, 0, 0, None))(t_delay, tracks, r_grid, scal0)
    assert len(calls) == 1, "Pallas path did not fire"
    ref = jax.vmap(G._eats_stage2_xla,
                   in_axes=(0, 0, 0, None, None, None, None, None))(
        t_delay, tracks, r_grid, scal0, log_q, cphi, wphi, nu_obs)
    scale = float(np.abs(np.asarray(ref)).max())
    num = np.abs(np.asarray(out) - np.asarray(ref))
    den = np.maximum(np.abs(np.asarray(ref)), 1e-6 * scale)
    assert (num / den).max() < 5e-3
