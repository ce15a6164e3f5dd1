"""Injection round-trip consistency: synthesized data matches direct model
evaluation (reference tests/injections.py:176-216, rtol 1e-3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nmma_tpu.injections import create_light_curve_data
from nmma_tpu.models import DetectorLightCurveModel
from nmma_tpu.ops.interp import masked_interp_sorted_fill

CASES = {
    "Me2017": dict(log10_mej=-1.5, log10_vej=-1.0, beta=3.0,
                   log10_kappa_r=0.5, luminosity_distance=40.0,
                   timeshift=0.0),
    "HoNa2020": dict(log10_mej=-1.5, vej_min=0.05, vej_max=0.3,
                     vej_frac=0.5, log10_kappa_low_vej=0.0,
                     log10_kappa_high_vej=0.7, luminosity_distance=40.0,
                     timeshift=0.0),
    "Piro2021": dict(log10_Menv=-1.0, log10_Renv=13.0, log10_Ee=51.0,
                     luminosity_distance=40.0, timeshift=0.0),
    "TrPi2018": dict(log10_E0=52.0, thetaCore=0.08, thetaWing=0.3,
                     inclination_EM=0.05, log10_n0=-1.0, p=2.4,
                     log10_epsilon_e=-1.2, log10_epsilon_B=-3.5, xi_N=1.0,
                     luminosity_distance=100.0, timeshift=0.0),
    "blackbody_fixedT": dict(log10_bb_luminosity=41.0, temperature=5000.0,
                             luminosity_distance=40.0, timeshift=0.0),
}

GRIDS = {
    "Piro2021": np.geomspace(0.05, 3.0, 60),
    "TrPi2018": np.geomspace(0.1, 80.0, 60),
}


@pytest.mark.parametrize("model_name", list(CASES))
def test_injection_matches_direct_model(model_name):
    params = CASES[model_name]
    grid = GRIDS.get(model_name, np.geomspace(0.1, 12.0, 80))
    filters = ["ztfg", "ztfr"]

    # noiseless injection via the data-synthesis path
    data = create_light_curve_data(params, model_name, filters,
                                   sample_times=grid, seed=0,
                                   injection_error_budget=1e-9)

    # direct model evaluation
    model = DetectorLightCurveModel(model_name, filters, sample_times=grid)
    obs_t, mags = model(params)

    for i, f in enumerate(filters):
        direct = np.asarray(masked_interp_sorted_fill(
            jnp.asarray(data[f]["time"]), obs_t, mags[i], jnp.inf))
        got = data[f]["mag"]
        sel = np.isfinite(direct) & np.isfinite(got)
        assert sel.sum() > 10, f"{model_name}/{f}: too few finite points"
        np.testing.assert_allclose(got[sel], direct[sel], rtol=1e-3,
                                   atol=1e-3)
