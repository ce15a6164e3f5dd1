"""Pallas Me2017 kernel: interpret-mode parity with the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from nmma_tpu.models.kilonova import _me2017_dynamics_xla
from nmma_tpu.ops.pallas_me2017 import me2017_dynamics_pallas


def test_pallas_dynamics_matches_xla(rng):
    t_days = jnp.asarray(np.geomspace(0.01, 14.0, 150), dtype=jnp.float32)
    b = 12
    log10_mej = jnp.asarray(rng.uniform(-3, -0.5, b).astype(np.float32))
    log10_vej = jnp.asarray(rng.uniform(-2, -0.5, b).astype(np.float32))
    beta = jnp.asarray(rng.uniform(1, 5, b).astype(np.float32))
    kappa = jnp.asarray(10 ** rng.uniform(-1, 2, b).astype(np.float32))

    lt_p, rp_p = me2017_dynamics_pallas(log10_mej, log10_vej, beta, kappa,
                                        t_days, interpret=True)
    lt_x, rp_x = jax.vmap(
        _me2017_dynamics_xla, in_axes=(0, 0, 0, 0, None))(
        log10_mej, log10_vej, beta, kappa, t_days)
    lt_p, rp_p = np.asarray(lt_p), np.asarray(rp_p)
    lt_x, rp_x = np.asarray(lt_x), np.asarray(rp_x)

    sel = lt_x > 1e-4
    rel = np.abs(lt_p[sel] / lt_x[sel] - 1)
    assert rel.max() < 2e-3, rel.max()
    sel_r = rp_x > 0
    rel_r = np.abs(rp_p[sel_r] / rp_x[sel_r] - 1)
    assert rel_r.max() < 1e-4, rel_r.max()
