import glob

import jax
import jax.numpy as jnp
import numpy as np

from nmma_tpu.eos import EOSTable, TabulatedEOSSet, load_macro_eos_set
from nmma_tpu.eos.likelihood import (JointEoSConstraint, LowerMTOVConstraint,
                                     MassRadiusConstraint,
                                     UpperMTOVConstraint)
from nmma_tpu.eos.tov import tov_solve

MICRO = "/root/reference/nmma/tests/data/eos_micro/1.dat"
MACRO = "/root/reference/nmma/tests/data/eos_macro/1.dat"
MACRO_DIR = "/root/reference/nmma/tests/data/eos_macro"

_MSUN_GEOM = 6.6743e-11 * 1.988409870698051e30 / 299792458.0**2


def test_tov_against_reference_macro_table():
    """Solve TOV from the bundled micro EOS; compare with the reference's
    own macro table at the same central pressures."""
    eos = EOSTable.from_file(MICRO)
    macro = np.loadtxt(MACRO)
    r_ref, m_ref, lam_ref, pc_ref = macro.T

    f = jax.jit(jax.vmap(lambda pc: tov_solve(eos, pc)))
    m_g, r_g, k2 = f(jnp.asarray(pc_ref))
    mass = np.asarray(m_g) / _MSUN_GEOM
    radius = np.asarray(r_g) * 1e-3
    comp = np.asarray(m_g) / np.asarray(r_g)
    lam = 2.0 / 3.0 * np.asarray(k2) / comp**5

    sel = m_ref > 1.1
    assert np.abs(mass / m_ref - 1)[sel].max() < 0.02
    assert np.abs(radius / r_ref - 1)[sel].max() < 0.01
    assert np.abs(lam / lam_ref - 1)[sel].max() < 0.10


def test_tabulated_eos_set_conversion():
    eos_set = load_macro_eos_set(MACRO_DIR)
    assert eos_set.n_eos == 10
    p = eos_set({"EOS": jnp.asarray(3.7), "mass_1_source": jnp.asarray(1.4),
                 "mass_2_source": jnp.asarray(1.2)})
    assert int(p["EOS_index"]) == 3
    assert float(p["TOV_mass"]) > 1.5
    assert 8.0 < float(p["radius_1"]) < 16.0
    assert float(p["lambda_2"]) > float(p["lambda_1"]) > 0  # lighter -> larger

    # above MTOV: black hole => radius 0
    p_bh = eos_set({"EOS": jnp.asarray(3.0), "mass_1_source": jnp.asarray(3.1),
                    "mass_2_source": jnp.asarray(1.2)})
    assert float(p_bh["radius_1"]) == 0.0


def test_mtov_constraints_ordering():
    lower = LowerMTOVConstraint(2.0, 0.05)
    upper = UpperMTOVConstraint(2.3, 0.05)
    heavy = {"TOV_mass": jnp.asarray(2.2)}
    light = {"TOV_mass": jnp.asarray(1.9)}
    assert float(lower(heavy)) > float(lower(light))
    assert float(upper(light)) > float(upper({"TOV_mass": jnp.asarray(2.5)}))
    joint = JointEoSConstraint(lower, upper)
    assert np.isfinite(float(joint(heavy)))


def test_mass_radius_constraint(rng):
    # synthetic NICER-like posterior centred at (R=12.5 km, M=1.5)
    masses = rng.normal(1.5, 0.1, 20000)
    radii = rng.normal(12.5, 0.4, 20000)
    c = MassRadiusConstraint(mass_array=masses, radius_array=radii)

    eos_set = load_macro_eos_set(MACRO_DIR)
    grid = jnp.asarray(eos_set.mass_grid)

    def logl_for(i):
        curves = {"masses": grid, "radii": eos_set.radii[i]}
        return float(c({"TOV_mass": eos_set.tov_mass[i]}, curves))

    vals = [logl_for(i) for i in range(eos_set.n_eos)]
    assert np.isfinite(vals).sum() >= 8
    # EOS with R(1.5) closest to 12.5 km should be preferred over furthest
    r15 = np.asarray(jax.vmap(
        lambda row: jnp.interp(1.5, grid, row))(eos_set.radii))
    best, worst = np.argmin(np.abs(r15 - 12.5)), np.argmax(np.abs(r15 - 12.5))
    assert vals[best] > vals[worst]
