"""Systematics configuration tests against the bundled reference yamls."""

import numpy as np
import pytest

from nmma_tpu.likelihood.systematics import SystematicsModel

LEGACY_TIME = "/root/reference/nmma/tests/data/systematics_with_time.yaml"
LEGACY_NOTIME = "/root/reference/nmma/tests/data/systematics_without_time.yaml"
LEGACY_GROUPS = ("/root/reference/nmma/tests/data/"
                 "systematics_with_time_combined_filters.yaml")


def test_legacy_with_time_all_filters():
    filters = ["ztfg", "ztfr"]
    sm = SystematicsModel(filters, LEGACY_TIME, model_time_range=(0.1, 10.0))
    priors = sm.create_priors()
    assert sorted(priors) == [f"em_syserr_all_{i}" for i in range(4)]
    sm.finalize(list(priors))
    params = {name: 0.3 + 0.1 * i for i, name in enumerate(sorted(priors))}
    times = np.tile(np.linspace(0.1, 10.0, 7), (2, 1))
    err = np.asarray(sm(params, times))
    assert err.shape == (2, 7)
    assert err.min() >= 0.3 - 1e-6 and err.max() <= 0.6 + 1e-6
    # interpolates between node values
    assert err[0, 0] < err[0, -1]


def test_legacy_without_time():
    sm = SystematicsModel(["ztfg"], LEGACY_NOTIME)
    priors = sm.create_priors()
    assert list(priors) == ["em_syserr"]
    sm.finalize(list(priors))
    err = np.asarray(sm({"em_syserr": 0.42},
                        np.linspace(0.1, 5, 5)[None, :]))
    np.testing.assert_allclose(err, 0.42)


def test_legacy_filter_groups():
    # bundled yaml groups: ztfr, null, [sdssu, 2massks]
    filters = ["ztfg", "2massj", "2massh", "sdssu"]
    sm = SystematicsModel(filters, LEGACY_GROUPS,
                          model_time_range=(0.1, 10.0))
    priors = sm.create_priors()
    assert any("sdssu___2massks" in n for n in priors)
    assert any(n.startswith("em_syserr_ztfr") for n in priors)
    sm.finalize(list(priors))
    # grouped filter gets its group's parameters; others share 'all'
    assert "sdssu___2massks" in sm.plans["sdssu"][1][0]
    assert sm.plans["2massj"] == sm.plans["2massh"] == sm.plans["ztfg"]
    assert "all" in sm.plans["ztfg"][1][0]


def test_modern_format_each():
    spec = {
        "kn": {"each": ["ztfg", "ztfr"], "time_nodes": 3,
               "time_range": "0.5 8.0",
               "prior": "Uniform(minimum=0.0, maximum=1.0)"},
    }
    sm = SystematicsModel(["ztfg", "ztfr"], spec,
                          model_time_range=(0.1, 14.0))
    priors = sm.create_priors()
    assert sorted(priors) == sorted(
        f"em_syserr_{f}_{i}" for f in ("ztfg", "ztfr") for i in range(3))
    sm.finalize(list(priors))
    assert sm.plans["ztfg"][0] == "interp"
    assert sm.plans["ztfg"][1] != sm.plans["ztfr"][1]


def test_analysis_merges_systematics_priors(tmp_path):
    from nmma_tpu.analysis import EMAnalysis, EMAnalysisConfig
    from nmma_tpu.inference import NestedSamplerConfig
    from nmma_tpu.priors import parse_prior_dict
    rng = np.random.default_rng(0)
    t = np.linspace(0.5, 8.0, 6)
    data = {"ztfg": {"time": t, "mag": 19 + 0.1 * t,
                     "mag_error": np.full(6, 0.1)}}
    priors = parse_prior_dict(
        "log10_mej = Uniform(minimum=-3., maximum=-0.5)\n"
        "log10_vej = -1.0\nbeta = 3.0\nlog10_kappa_r = 0.5\n"
        "luminosity_distance = 40.0\ntimeshift = 0.0\n")
    cfg = EMAnalysisConfig(model="Me2017", trigger_time=0.0,
                           systematics_file=LEGACY_TIME,
                           outdir=str(tmp_path))
    ana = EMAnalysis(cfg, data=data, priors=priors)
    assert "em_syserr_all_0" in ana.priors.priors
    assert ana.priors.ndim == 1 + 4
    import jax
    logl = float(ana._unit_logl(np.full(ana.priors.ndim, 0.5)))
    assert np.isfinite(logl)
