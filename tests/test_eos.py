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


def test_cse_extension_vs_scipy_oracle():
    """CSE RK4 log-space integration matches an f64 DOP853 oracle."""
    import jax.numpy as jnp
    from scipy.integrate import solve_ivp
    from scipy.interpolate import interp1d

    from nmma_tpu.eos.cse import (connection_state, cse_extend,
                                  draw_cs2_nodes)
    arr = np.loadtxt(MICRO)
    n, e, p = arr[:, 0], arr[:, 1], arr[:, 2]
    p_c, e_c, cs2_c = connection_state(n, p, e, 0.16)
    assert 0.0 < cs2_c < 1.0
    nodes = draw_cs2_nodes(7, 0.16, 2.0, cs2_c, n_draws=1)[0]

    cs2_f = interp1d(nodes[:, 0], nodes[:, 1], fill_value="extrapolate")

    def dydt(t, y):
        logp, loge = y
        pp, ee = np.exp(logp), np.exp(loge)
        return [float(cs2_f(np.exp(t))) * (ee / pp + 1.0), 1.0 + pp / ee]

    sol = solve_ivp(dydt, (np.log(0.16), np.log(2.0)),
                    [np.log(p_c), np.log(e_c)], method="DOP853",
                    dense_output=True, rtol=1e-9, atol=0.0)
    n_hi, p_hi, e_hi = cse_extend(jnp.asarray(nodes), p_c, e_c, 0.16, 2.0,
                                  512)
    ref = sol.sol(np.log(np.asarray(n_hi)))
    assert np.max(np.abs(np.asarray(p_hi) / np.exp(ref[0]) - 1.0)) < 5e-4
    assert np.max(np.abs(np.asarray(e_hi) / np.exp(ref[1]) - 1.0)) < 5e-4


def test_cse_family_tov():
    """A CSE-extended family yields physical NS branches under TOV."""
    from nmma_tpu.eos import construct_family, cse_eos_family
    arr = np.loadtxt(MICRO)
    low = {"n": arr[:, 0], "p": arr[:, 2], "e": arr[:, 1]}
    tables = cse_eos_family(low, seed=3, n_draws=3)
    for t in tables:
        r, m, lam, _ = construct_family(t)
        m, r = np.asarray(m), np.asarray(r)
        ns = (r < 20.0) & (m > 0.5)
        assert ns.any()
        assert 1.2 < m[ns].max() < 3.0
        assert 8.0 < r[ns][np.argmax(m[ns])] < 16.0


def test_tabulate_weighted_eos_and_categorical(tmp_path):
    """EOS reweighting under constraints + WeightedCategorical prior."""
    import glob

    import jax.numpy as jnp

    from nmma_tpu.eos import load_macro_eos_set, tabulate_weighted_eos
    from nmma_tpu.eos.likelihood import (JointEoSConstraint,
                                         LowerMTOVConstraint)
    from nmma_tpu.priors import WeightedCategorical

    eos_set = load_macro_eos_set("/root/reference/nmma/tests/data/eos_macro")
    constraint = JointEoSConstraint(LowerMTOVConstraint(2.01, 0.04))
    wpath, sdir, n, weights = tabulate_weighted_eos(
        eos_set, constraint, str(tmp_path))
    assert n == len(np.asarray(eos_set.tov_mass))
    assert np.all(np.diff(weights) >= 0)              # sorted ascending
    assert abs(weights.sum() - 1.0) < 1e-8            # normalised
    assert len(glob.glob(str(tmp_path / "sorted" / "*.dat"))) == n
    # heavier-MTOV EOS must carry more weight under a lower-MTOV bound
    tovs = np.asarray(eos_set.tov_mass)
    saved = np.loadtxt(wpath)
    assert np.array_equal(np.round(saved, 10), np.round(weights, 10))

    # WeightedCategorical inverts the weight CDF
    prior = WeightedCategorical(n, weights)
    u = np.linspace(0.001, 0.999, 4001)
    idx = np.floor(np.asarray(prior.transform(jnp.asarray(u)))).astype(int)
    freq = np.bincount(idx, minlength=n) / len(u)
    assert np.allclose(freq, weights, atol=0.01)
    # uniform default
    pu = WeightedCategorical(4)
    iu = np.floor(np.asarray(pu.transform(jnp.asarray(u)))).astype(int)
    assert np.allclose(np.bincount(iu, minlength=4) / len(u), 0.25,
                       atol=0.01)
    import pytest
    with pytest.raises(ValueError):
        WeightedCategorical(3, [0.5, 0.5])


def test_eos_mr_band_plot(tmp_path):
    from nmma_tpu.eos import load_macro_eos_set
    from nmma_tpu.plotting import eos_mr_band_plot
    import os
    eos_set = load_macro_eos_set("/root/reference/nmma/tests/data/eos_macro")
    out = eos_mr_band_plot(eos_set, save_path=str(tmp_path / "mr.png"))
    assert os.path.getsize(out) > 10000


def test_tov_emulator_accuracy_and_conversion(tmp_path):
    """NEP -> macro TOV emulator (reference EoSConverter('emulated')):
    held-out accuracy vs the real TOV solve, conversion-step semantics,
    and save/load round trip."""
    import jax
    import jax.numpy as jnp

    from nmma_tpu.eos.emulator import (TOVEmulator, _macro_targets,
                                       train_tov_emulator)
    from nmma_tpu.eos.generation import crust_from_micro_table

    crust = crust_from_micro_table(np.loadtxt(MICRO))
    emu = train_tov_emulator(crust, n_train=72, n_epochs=3000, seed=1)

    rng = np.random.default_rng(9)
    worst_mtov = worst_r = 0.0
    for _ in range(4):
        s0 = rng.uniform(29.0, 35.0)
        l_sym = rng.uniform(35.0, 85.0)
        mtov_t, radii_t, loglam_t = _macro_targets(s0, l_sym, crust,
                                                   emu.x_grid)
        mtov_p, radii_p, loglam_p = map(np.asarray, emu.forward(
            jnp.asarray([s0, l_sym], dtype=jnp.float32)))
        worst_mtov = max(worst_mtov, abs(mtov_p - mtov_t) / mtov_t)
        worst_r = max(worst_r, float(np.max(np.abs(radii_p - radii_t)
                                            / radii_t)))
    assert worst_mtov < 0.02, worst_mtov
    assert worst_r < 0.03, worst_r

    # conversion step inside a jit, including the BH branch
    conv = jax.jit(emu.__call__)
    out = conv({"S0": 32.0, "L": 60.0, "mass_1_source": 1.4,
                "mass_2_source": 1.3})
    assert float(out["TOV_mass"]) > 1.5
    assert 8.0 < float(out["R_14"]) < 16.0
    assert float(out["lambda_1"]) > 10.0
    out_bh = conv({"S0": 32.0, "L": 60.0, "mass_1_source": 5.0,
                   "mass_2_source": 1.3})
    assert float(out_bh["radius_1"]) == 0.0
    assert float(out_bh["lambda_1"]) == 0.0

    path = tmp_path / "emulator.npz"
    emu.save(str(path))
    back = TOVEmulator.load(str(path))
    a = np.asarray(emu.forward(jnp.asarray([32.0, 60.0]))[1])
    b = np.asarray(back.forward(jnp.asarray([32.0, 60.0]))[1])
    np.testing.assert_allclose(a, b, rtol=1e-6)
