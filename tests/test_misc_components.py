"""Run-matrix expansion, extinction laws, NEP EOS generation, converters."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _ns(**kw):
    defaults = dict(label="run", model="Me2017", nlive=64, multi=None,
                    matrix=None)
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_multi_single_key():
    from nmma_tpu.cli.multi import expand_runs
    runs = expand_runs(_ns(multi={"model": ["Me2017", "HoNa2020"]}))
    assert [r.label for r in runs] == ["run_0", "run_1"]
    assert [r.model for r in runs] == ["Me2017", "HoNa2020"]


def test_multi_named_runs():
    from nmma_tpu.cli.multi import expand_runs
    runs = expand_runs(_ns(multi={"fast": {"nlive": 32},
                                  "deep": {"nlive": 512}}))
    assert [r.label for r in runs] == ["run_fast", "run_deep"]
    assert [r.nlive for r in runs] == [32, 512]


def test_matrix_product():
    from nmma_tpu.cli.multi import expand_runs
    runs = expand_runs(_ns(matrix={"model": ["Me2017", "HoNa2020"],
                                   "nlive": [64, 128]}))
    assert len(runs) == 4
    assert {(r.model, r.nlive) for r in runs} == {
        ("Me2017", 64), ("Me2017", 128), ("HoNa2020", 64), ("HoNa2020", 128)}


def test_unknown_key_raises():
    from nmma_tpu.cli.multi import expand_runs
    with pytest.raises(KeyError):
        expand_runs(_ns(multi={"notaflag": [1, 2]}))


def test_mw_extinction_law():
    from nmma_tpu.ops.extinction import extinction_mags_mw
    from nmma_tpu.filters import filters_to_frequencies
    nu = filters_to_frequencies(["ztfg", "ztfr", "2massks"])
    a_lambda = np.asarray(extinction_mags_mw(nu, Ebv=0.1))
    # A_g > A_r > A_Ks, all positive; A_V ~ 3.1 * 0.1 => A_g ~ 0.37
    assert a_lambda[0] > a_lambda[1] > a_lambda[2] > 0
    assert 0.25 < a_lambda[0] < 0.45
    # detector model accepts the law
    from nmma_tpu.models import DetectorLightCurveModel
    m = DetectorLightCurveModel("Me2017", ["ztfg"], extinction_law="G23_MW")
    _, mags_ext = m(dict(log10_mej=-1.5, log10_vej=-1.0, beta=3.0,
                         log10_kappa_r=0.5, luminosity_distance=40.0,
                         Ebv=0.2))
    m2 = DetectorLightCurveModel("Me2017", ["ztfg"])
    _, mags0 = m2(dict(log10_mej=-1.5, log10_vej=-1.0, beta=3.0,
                       log10_kappa_r=0.5, luminosity_distance=40.0))
    sel = np.isfinite(np.asarray(mags0[0]))
    assert np.all(np.asarray(mags_ext[0])[sel] > np.asarray(mags0[0])[sel])


def test_nep_eos_generation():
    from nmma_tpu.eos import crust_from_micro_table, nep_eos_table
    from nmma_tpu.eos.tov import tov_solve
    crust = crust_from_micro_table(
        "/root/reference/nmma/tests/data/eos_micro/1.dat")
    eos = nep_eos_table(32.0, 50.0, crust)
    f = jax.jit(jax.vmap(lambda pc: tov_solve(eos, pc)))
    m_g, r_g, _ = f(jnp.geomspace(5.0, 600.0, 32))
    msun_geom = 6.6743e-11 * 1.988409870698051e30 / 299792458.0**2
    mass = np.asarray(m_g) / msun_geom
    radius = np.asarray(r_g) * 1e-3
    imax = np.argmax(mass)
    assert 1.8 < mass[imax] < 2.6
    r14 = np.interp(1.4, mass[:imax + 1], radius[:imax + 1])
    assert 10.0 < r14 < 14.5
    # stiffer symmetry energy (larger L) -> larger R(1.4)
    eos2 = nep_eos_table(34.0, 90.0, crust)
    m2, r2, _ = jax.jit(jax.vmap(lambda pc: tov_solve(eos2, pc)))(
        jnp.geomspace(5.0, 600.0, 32))
    mass2 = np.asarray(m2) / msun_geom
    radius2 = np.asarray(r2) * 1e-3
    i2 = np.argmax(mass2)
    assert np.interp(1.4, mass2[:i2 + 1], radius2[:i2 + 1]) > r14


def test_skyportal_converter(tmp_path):
    from nmma_tpu.io.photometry import convert_skyportal_lcs
    csv = tmp_path / "lc.csv"
    csv.write_text(
        "mjd,filter,mag,magerr,limiting_mag\n"
        "59000.1,ztfg,19.2,0.1,20.5\n"
        "59000.2,ztfr,,,20.3\n")
    out = convert_skyportal_lcs(csv)
    lines = open(out).read().strip().splitlines()
    assert lines[0].split()[1] == "ztfg"
    assert lines[1].split()[2] == "20.3" and lines[1].split()[3] == "inf"

    from nmma_tpu.io import load_em_observations
    data = load_em_observations(out)
    assert not np.isfinite(data["ztfr"]["mag_error"][0])


def test_sig_lims_formatting():
    """sig_lims renders median/err to significant figures (reference
    core/utils.py:186-204)."""
    import numpy as np

    from nmma_tpu.plotting_utils import sig_lims
    rng = np.random.default_rng(0)
    s = sig_lims(rng.normal(1.234, 0.011, 20000))
    assert s.startswith("$") and "_{-" in s and "^{+" in s
    # error ~0.011 -> 2 sig figs at the 3rd decimal
    assert "1.23" in s
    # large-error branch rounds to integers
    s2 = sig_lims(rng.normal(1200.0, 110.0, 20000))
    assert "{1" in s2 and "." not in s2


def test_nan_level_bounds():
    """nan_level charges NaNs against the credible level (reference
    core/utils.py:236-247)."""
    import numpy as np

    from nmma_tpu.plotting_utils import nan_level
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 10000)
    lo, hi = nan_level(x, 0.9)
    assert abs(lo + 1.645) < 0.08 and abs(hi - 1.645) < 0.08
    # 20% NaNs count as already-outside mass: the remaining interval
    # covers only level - nan_share of the clean data, so it NARROWS
    x_nan = x.copy()
    x_nan[:2000] = np.nan
    lo2, hi2 = nan_level(x_nan, 0.9)
    assert lo2 > lo and hi2 < hi
    # NaN share above the level: undefined
    x_bad = x.copy()
    x_bad[:9500] = np.nan
    assert np.isnan(nan_level(x_bad, 0.9)).all()
    # weighted: doubling weight on the right tail shifts bounds right
    w = np.where(x > 0, 2.0, 1.0)
    lo3, hi3 = nan_level(x, 0.9, weights=w)
    assert lo3 > lo and hi3 > hi * 0.95
