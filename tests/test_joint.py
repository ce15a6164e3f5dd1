"""Joint GW + EM + EOS multimessenger inference test (BASELINE config 5
analogue): zero-noise TaylorF2 injection + surrogate kilonova photometry +
tabulated-EOS conversion, one fused likelihood, short nested-sampling run.
"""

import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmma_tpu import conversion as C
from nmma_tpu.eos import load_macro_eos_set
from nmma_tpu.eos.likelihood import JointEoSConstraint, LowerMTOVConstraint
from nmma_tpu.gw import GWTransientLikelihood, InterferometerData
from nmma_tpu.inference import NestedSampler, NestedSamplerConfig
from nmma_tpu.joint import MultiMessengerLikelihood
from nmma_tpu.likelihood import EMLikelihood, PhotometryData, SystematicsModel
from nmma_tpu.models import DetectorLightCurveModel
from nmma_tpu.population import NeutronStarPopulation
from nmma_tpu.priors import parse_prior_dict

MACRO_DIR = "/root/reference/nmma/tests/data/eos_macro"
TRIGGER = 1187008882.4


@pytest.fixture(scope="module")
def joint_setup():
    eos_set = load_macro_eos_set(MACRO_DIR)

    # surrogate KN model trained on the bundled bulla grid
    from nmma_tpu.models.svd import make_svd_source_model
    from nmma_tpu.training import (SVDTrainingConfig, read_bulla_grid,
                                   train_svd_model)
    files = glob.glob("/root/reference/nmma/tests/data/bulla/*.dat")
    entries, pnames, filters = read_bulla_grid(files, model="Bu2019lm_sparse")
    svd = train_svd_model(entries, pnames, filters,
                          SVDTrainingConfig(n_coeff=10, hidden=64,
                                            n_epochs=3000, tmin=0.2,
                                            n_tsteps=80),
                          verbose=False)
    source = make_svd_source_model("Bu2019lm_sparse_joint", svd)

    conversion = C.MultimessengerConversion(
        C.bns_source_frame, eos_set, C.KilonovaEjectaFitting())

    injection = dict(
        chirp_mass=1.1977, mass_ratio=0.9, luminosity_distance=40.0,
        EOS=4.2, ratio_zeta=0.3, alpha=5e-5, theta_jn=0.4, phase=1.3,
        psi=1.5, ra=3.446, dec=-0.408, geocent_time=0.0, timeshift=0.0,
    )
    inj_conv = conversion(dict(injection))
    assert np.isfinite(float(inj_conv["log10_mej_dyn"]))

    # GW data: zero-noise injection with EOS-derived lambdas
    gw_params = {k: float(np.asarray(v)) for k, v in inj_conv.items()
                 if np.ndim(v) == 0}
    ifos = [InterferometerData.zero_noise_injection(
        n, gw_params, duration=32.0, f_min=25.0, f_max=512.0,
        trigger_time=TRIGGER) for n in ("H1", "L1")]
    gw_likelihood = GWTransientLikelihood(ifos, trigger_time=TRIGGER)

    # EM data from the converted injection through the surrogate
    em_filters = ["ztfg", "ztfr"]
    lc_model = DetectorLightCurveModel(source, em_filters)
    obs_times, mags = lc_model(inj_conv)
    t_obs = np.linspace(0.5, 10.0, 12)
    from nmma_tpu.ops.interp import masked_interp_sorted_fill
    rng = np.random.default_rng(11)
    data = {}
    for i, f in enumerate(em_filters):
        m = np.asarray(masked_interp_sorted_fill(t_obs, obs_times, mags[i],
                                                 jnp.inf))
        assert np.isfinite(m).all(), f"injection LC not finite in {f}"
        data[f] = {"time": t_obs, "mag": m + rng.normal(0, 0.1, len(t_obs)),
                   "mag_error": np.full(len(t_obs), 0.1)}
    photo, _ = PhotometryData.from_dict(data, em_filters)
    em_likelihood = EMLikelihood(lc_model, photo, em_filters,
                                 SystematicsModel(em_filters, error_budget=1.0))

    eos_constraint = JointEoSConstraint(LowerMTOVConstraint(2.0, 0.05))
    population = NeutronStarPopulation("peak", beta=0.0)

    joint = MultiMessengerLikelihood(
        conversion,
        [gw_likelihood, em_likelihood,
         lambda p: eos_constraint(p), population],
        sanity_keys=("log10_mej_dyn",))
    return joint, injection, eos_set


def test_joint_likelihood_at_injection(joint_setup):
    joint, injection, _ = joint_setup
    logl_inj = float(joint(injection))
    assert np.isfinite(logl_inj) and logl_inj > -1e29

    # perturbations reduce the joint likelihood
    assert float(joint({**injection, "chirp_mass": 1.20})) < logl_inj
    assert float(joint({**injection, "luminosity_distance": 80.0})) < logl_inj
    assert float(joint({**injection, "ratio_zeta": 0.05})) < logl_inj


def test_joint_pe_short_run(joint_setup):
    joint, injection, eos_set = joint_setup
    priors = parse_prior_dict(
        "chirp_mass = Uniform(minimum=1.18, maximum=1.21)\n"
        "mass_ratio = Uniform(minimum=0.7, maximum=1.0)\n"
        "luminosity_distance = Uniform(minimum=20., maximum=80.)\n"
        f"EOS = Uniform(minimum=0., maximum={eos_set.n_eos})\n"
        "ratio_zeta = Uniform(minimum=0.05, maximum=0.6)\n"
        "alpha = 5e-5\n"
        "theta_jn = 0.4\nphase = 1.3\npsi = 1.5\nra = 3.446\ndec = -0.408\n"
        "geocent_time = 0.0\ntimeshift = 0.0\n")

    def unit_logl(u):
        params = priors.transform(u)
        return joint(params)

    batched = jax.vmap(unit_logl)
    sampler = NestedSampler(batched, priors.ndim,
                            NestedSamplerConfig(nlive=96, n_delete=12,
                                                walks=10, dlogz=1.0,
                                                chunk_size=5, max_iter=250))
    res = sampler.run(verbose=False)
    assert np.isfinite(res.logz)
    idx = res.posterior_indices()
    post = priors.transform(jnp.asarray(res.samples_u[idx]))
    mc = np.asarray(post["chirp_mass"])
    # chirp mass recovered very precisely by the GW data
    assert abs(np.median(mc) - 1.1977) < 2e-3, np.median(mc)
    dl = np.asarray(post["luminosity_distance"])
    assert abs(np.median(dl) - 40.0) < 12.0
