"""Light-curve model layer: pure source kernels + detector-frame assembly.

TPU-native re-design of the reference's class hierarchy
(``nmma/em/model.py:180-404``): instead of stateful model objects mutating
``self.redshift``/``self.distmod`` per likelihood call, a model here is a
pure function

    ``mags = source_fn(params, t_days, nu_host) -> f32[F, T]``

(absolute AB magnitudes on a static source-frame time grid), and
``DetectorLightCurveModel.__call__`` is a pure jittable map
``params -> (obs_times[T], mags[F, T])`` applying redshift stretch,
timeshift, distance modulus, K-ish correction and extinction exactly as
``gen_detector_lc``/``combine_detector_data`` (nmma/em/model.py:352-404).

Everything is batched by construction: wrap the call in ``jax.vmap`` over a
struct-of-arrays parameter dict to evaluate a whole live-point batch.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmology import distance_modulus, get_cosmology
from ..filters import filters_to_frequencies
from ..ops.extinction import band_extinction_mags_p92_smc

# canonical parameter lists per model (reference: model_parameters_dict,
# nmma/em/model.py:29-132)
MODEL_PARAMETERS = {
    "Arnett": ["tau_m", "log10_mni"],
    "Arnett_modified": ["tau_m", "log10_mni", "t_0"],
    "Bu2019nsbh": ["log10_mej_dyn", "log10_mej_wind", "KNtheta"],
    "Bu2019lm": ["log10_mej_dyn", "log10_mej_wind", "KNphi", "KNtheta"],
    "Bu2019lm_sparse": ["log10_mej_dyn", "log10_mej_wind"],
    "Ka2017": ["log10_mej", "log10_vej", "log10_Xlan"],
    "TrPi2018": [
        "inclination_EM", "log10_E0", "thetaCore", "thetaWing", "b", "L0",
        "q", "ts", "log10_n0", "p", "log10_epsilon_e", "log10_epsilon_B",
        "xi_N", "d_L",
    ],
    "Piro2021": ["log10_Menv", "log10_Renv", "log10_Ee"],
    "Me2017": ["log10_mej", "log10_vej", "beta", "log10_kappa_r"],
    "HoNa2020": [
        "log10_mej", "vej_max", "vej_min", "vej_frac",
        "log10_kappa_low_vej", "log10_kappa_high_vej",
    ],
    "Bu2022mv": ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind", "KNtheta"],
    "PL_BB_fixedT": ["bb_luminosity", "temperature", "beta", "powerlaw_mag"],
    "blackbody_fixedT": ["bb_luminosity", "temperature"],
    "synchrotron_powerlaw": ["alpha_time", "beta_freq", "F_ref", "luminosity_distance"],
    "AnBa2022_sparse": ["mrp", "xmix"],
    "AnBa2022_log": ["log10_mtot", "log10_mni", "vej", "log10_mrp", "xmix"],
    "AnBa2022_linear": ["mtot", "mni", "vej", "mrp", "xmix"],
    "salt2": ["x0", "x1", "c"],
    "Sr2023": ["a_AG", "alpha_AG", "f_nu_host"],
    "Bu2022Ye": ["log10_mej_dyn", "vej_dyn", "Yedyn", "log10_mej_wind",
                 "vej_wind", "KNtheta"],
    "Bu2023Ye": ["log10_mej_dyn", "vej_dyn", "Yedyn", "log10_mej_wind",
                 "vej_wind", "Yewind", "KNtheta"],
    "LANL2022": ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind", "KNtheta"],
    # LANL wind-morphology grid variants: identical parameter lists to
    # LANL2022 (reference nmma/em/model.py:104-131) — distinct names select
    # distinct training grids via GRID_PARSERS.
    "LANLTP1": ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind", "KNtheta"],
    "LANLTP2": ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind", "KNtheta"],
    "LANLTS1": ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind", "KNtheta"],
    "LANLTS2": ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind", "KNtheta"],
    # toy example grid (reference nmma/em/model.py:72, model_parameters.py:84)
    "CV": ["example_num"],
}


def observation_angle_conversion(parameters):
    """KNtheta [deg] <-> inclination_EM [rad] <-> theta_jn completion.

    Pure version of ``observation_angle_conversion``
    (nmma/core/conversion.py:119-126); key logic runs at trace time.
    """
    parameters = dict(parameters)
    if "theta_jn" in parameters:
        theta_jn = jnp.asarray(parameters["theta_jn"])
    elif "cos_theta_jn" in parameters:
        theta_jn = jnp.arccos(jnp.asarray(parameters["cos_theta_jn"]))
    else:
        theta_jn = jnp.asarray(0.0)
    theta_jn = jnp.minimum(theta_jn, jnp.pi - theta_jn)
    if "KNtheta" not in parameters:
        parameters["KNtheta"] = (
            parameters.get("inclination_EM", theta_jn) * 180.0 / jnp.pi
        )
    if "inclination_EM" not in parameters:
        parameters["inclination_EM"] = parameters["KNtheta"] / 180.0 * jnp.pi
    return parameters


def complete_log_parameters(parameters, model_parameter_names):
    """log10_x <-> x autocompletion for a model's canonical parameters.

    Mirrors ``LightCurveModelContainer.parameter_conversion``
    (nmma/em/model.py:272-286); purely key-based, so trace-time only.
    """
    parameters = dict(parameters)
    for key in model_parameter_names:
        if key in parameters:
            continue
        stripped = key[len("log10_"):] if key.startswith("log10_") else None
        if stripped and stripped in parameters:
            parameters[key] = jnp.log10(jnp.asarray(parameters[stripped]))
        elif "log10_" + key in parameters:
            parameters[key] = 10.0 ** jnp.asarray(parameters["log10_" + key])
    return parameters


@dataclass(frozen=True)
class SourceModel:
    """A pure source-frame light-curve kernel plus its metadata."""

    name: str
    parameter_names: tuple
    mags_fn: Callable  # (params, t_days[T], nu_host[F]) -> [F, T] abs AB mags
    default_time_grid: Callable = None  # () -> np.ndarray[T]
    citation: str = ""
    bolometric: bool = False
    needs_filters: bool = False  # kernel wants the static filter-name list
    # filter rows the kernel emits; None => kernel follows the requested
    # filters (analytic models evaluate any nu). SVD surrogates are trained
    # per filter, so their output rows are fixed and get gathered/inf-filled
    # to the requested set (reference calc_svd_lc null-output, :166-168).
    filter_names: tuple = None
    # SALT-style models sample an APPARENT amplitude (x0 already encodes
    # the distance): the detector map must not add the distance modulus
    # on top (reference SupernovaLightCurveModel.gen_detector_lc
    # "SALT models are exempt", nmma/em/model.py:1216-1222)
    apparent_amplitude: bool = False

    def time_grid(self):
        if self.default_time_grid is not None:
            return self.default_time_grid()
        return np.geomspace(0.01, 14.0, 150)


def _filter_kwargs(fn, kwargs: dict) -> dict:
    """Keep only the kwargs ``fn``'s signature accepts (or all on **kw)."""
    if not kwargs:
        return {}
    sig = inspect.signature(fn)
    if any(p.kind is inspect.Parameter.VAR_KEYWORD
           for p in sig.parameters.values()):
        return dict(kwargs)
    return {k: v for k, v in kwargs.items() if k in sig.parameters}


_SOURCE_MODELS: dict[str, SourceModel] = {}


def register_source_model(model: SourceModel):
    _SOURCE_MODELS[model.name] = model
    return model


def get_source_model(name: str) -> SourceModel:
    # import kernels lazily so registration happens on first use
    from . import grb, kilonova, shock_cooling, supernova  # noqa: F401
    if name not in _SOURCE_MODELS:
        model = _resolve_spectral_template(name)
        if model is not None:
            return model
        raise KeyError(
            f"Unknown source model {name!r}; known: {sorted(_SOURCE_MODELS)}"
        )
    return _SOURCE_MODELS[name]


def _resolve_spectral_template(name: str):
    """sncosmo-name resolution for spectral templates: the reference
    resolves 'nugent-hyper'/'salt2' through sncosmo's download registry
    (nmma/em/model.py:1061-1227); here — zero-egress environment — a
    template named NAME resolves from $NMMA_SPECTRAL_TEMPLATES (or
    ~/.nmma_tpu/templates): NAME.dat / NAME.h5 for time-series
    templates, or a NAME/ directory with salt2_template_0.dat,
    salt2_template_1.dat [, salt2_color_law.dat] for SALT2-architecture
    surfaces."""
    import os

    base = os.environ.get(
        "NMMA_SPECTRAL_TEMPLATES",
        os.path.join(os.path.expanduser("~"), ".nmma_tpu", "templates"))
    from .spectral import (load_sncosmo_ascii_template,
                           make_salt2_source_model,
                           spectral_model_from_file)
    salt_dir = os.path.join(base, name)
    if os.path.isdir(salt_dir):
        m0_path = os.path.join(salt_dir, "salt2_template_0.dat")
        m1_path = os.path.join(salt_dir, "salt2_template_1.dat")
        if os.path.exists(m0_path) and os.path.exists(m1_path):
            phase, wave, m0 = load_sncosmo_ascii_template(m0_path)
            _, _, m1 = load_sncosmo_ascii_template(m1_path)
            cl_path = os.path.join(salt_dir, "salt2_color_law.dat")
            cl = None
            if os.path.exists(cl_path):
                raw = np.loadtxt(cl_path)
                cl = np.interp(wave, raw[:, 0], raw[:, 1])
            return make_salt2_source_model(name, phase, wave, m0, m1,
                                           color_law=cl)
    for ext in (".dat", ".txt", ".h5", ".hdf5"):
        path = os.path.join(base, name + ext)
        if os.path.exists(path):
            # SALT-family single files keep the sampled-amplitude
            # convention (no anchoring; reference "SALT2 exemption")
            anchored = not name.lower().startswith("salt")
            return spectral_model_from_file(name, path, anchor=anchored)
    return None


class DetectorLightCurveModel:
    """Pure detector-frame light-curve map for one source model.

    Static configuration (filters, time grid, cosmology tables) lives on the
    object; ``__call__(params)`` is pure and traceable, and batched via
    ``jax.vmap``. Reference semantics: ``gen_detector_lc`` +
    ``combine_detector_data`` (nmma/em/model.py:352-404).
    """

    def __init__(self, model, filters: Sequence[str], sample_times=None,
                 cosmology=None, extinction_law: str = "P92_SMC_host",
                 model_kwargs: dict | None = None):
        if isinstance(model, str):
            model = get_source_model(model)
        self.source: SourceModel = model
        self.filters = list(filters)
        # auto-append the helper model filters that synonym/composite
        # resolution of the requested set needs (observed V on a
        # ugrizy surrogate averages g and r; the helpers ride as EXTRA
        # trailing rows so requested-filter row indices are unchanged)
        from ..filters import resolve_filter
        extra = []
        for f in list(self.filters):
            try:
                kind, payload = resolve_filter(
                    f, available=self.source.filter_names)
            except KeyError:
                continue   # surfaced with full context by the likelihood
            needed = payload if kind == "average" else (payload,)
            for h in needed:
                if h not in self.filters and h not in extra:
                    extra.append(h)
        self.filters += extra
        # static kernel options (e.g. grb_resolution / jet_type for the
        # afterglow kernel; reference GRBLightCurveModel resolution,
        # nmma/em/model.py:804-843). Only options the kernel's signature
        # accepts are forwarded so one config can drive mixed model sets.
        self.model_kwargs = _filter_kwargs(model.mags_fn, model_kwargs or {})
        self.nu_0s = jnp.asarray(filters_to_frequencies(self.filters))
        # bandpass-integral support: kernels whose signature declares
        # nu_nodes/nu_weights get the per-filter frequency quadrature
        # (transmission-weighted band magnitudes instead of point sampling
        # at the effective wavelength; reference integrates via sncosmo,
        # nmma/em/model.py:1121-1180)
        sig_params = inspect.signature(model.mags_fn).parameters
        # **kwargs kernels (the combined model) forward per-sub via
        # _filter_kwargs, so they count as banded-capable
        self._banded = "nu_nodes" in sig_params or any(
            p.kind is inspect.Parameter.VAR_KEYWORD
            for p in sig_params.values())
        # the quadrature always exists: banded kernels integrate the
        # source spectrum over it, and extinction is band-averaged over it
        # for every model (delta-collapse filters make both reduce to
        # point sampling)
        from ..filters import filters_to_quadrature
        nodes, weights = filters_to_quadrature(self.filters)
        self.nu_nodes = jnp.asarray(nodes)
        self.nu_weights = jnp.asarray(weights)
        self.sample_times = jnp.asarray(
            sample_times if sample_times is not None else self.source.time_grid()
        )
        self.cosmology = cosmology or get_cosmology()
        if extinction_law not in ("P92_SMC_host", "G23_MW"):
            raise ValueError(
                f"unknown extinction_law {extinction_law!r}; use "
                "'P92_SMC_host' or 'G23_MW'")
        self.extinction_law = extinction_law

    # -- parameter plumbing (trace-time key logic, jnp value ops) -----------
    def prepare_parameters(self, parameters):
        p = observation_angle_conversion(parameters)
        p = complete_log_parameters(p, self.source.parameter_names)
        p.setdefault("luminosity_distance", 1e-5)  # 10 pc default
        p.setdefault("timeshift", 0.0)
        p.setdefault("Ebv", 0.0)
        if "redshift" not in p:
            p["redshift"] = self.cosmology.redshift_at_dl(
                jnp.asarray(p["luminosity_distance"])
            )
        return p

    def __call__(self, parameters, sample_times=None):
        """params -> (observable_times[T], apparent mags [F, T])."""
        t = self.sample_times if sample_times is None else jnp.asarray(sample_times)
        p = self.prepare_parameters(parameters)
        z = jnp.asarray(p["redshift"])
        d_lum = jnp.asarray(p["luminosity_distance"])

        p["distance_modulus"] = distance_modulus(d_lum)
        nu_host = self.nu_0s * (1.0 + z)
        extra = dict(self.model_kwargs)
        if self._banded:
            extra["nu_nodes"] = self.nu_nodes * (1.0 + z)
            extra["nu_weights"] = self.nu_weights
        if self.source.needs_filters:
            mags = self.source.mags_fn(p, t, nu_host, filters=self.filters,
                                       **extra)
        else:
            mags = self.source.mags_fn(p, t, nu_host,
                                       **extra)  # [F, T] abs mags

        if self.source.filter_names is not None:
            # align the kernel's fixed filter rows with the requested set;
            # untrained filters become all-inf rows
            src = list(self.source.filter_names)
            rows = []
            for f in self.filters:
                if f in src:
                    rows.append(mags[src.index(f)])
                else:
                    rows.append(jnp.full(t.shape, jnp.inf))
            mags = jnp.stack(rows)

        observable_times = t * (1.0 + z) + jnp.asarray(p["timeshift"])

        if self.source.bolometric:
            # bolometric lbol gets a (1+z)^2 energy/time-bin correction
            # (nmma/em/model.py:526-529)
            return observable_times, mags / (1.0 + z) ** 2

        # band-averaged extinction (transmission-weighted mean flux
        # factor; exact point sampling for delta-quadrature filters)
        if self.extinction_law == "G23_MW":
            from ..ops.extinction import band_extinction_mags_mw
            ext_mag = band_extinction_mags_mw(
                self.nu_nodes, self.nu_weights, jnp.asarray(p["Ebv"]))
        else:
            ext_mag = band_extinction_mags_p92_smc(
                self.nu_nodes, self.nu_weights, jnp.asarray(p["Ebv"]), z)
        redshift_correction = -2.5 * jnp.log10(1.0 + z)
        # SALT exemption: a sampled apparent amplitude already encodes
        # the distance; adding distmod would double-count it
        dist_corr = (0.0 if self.source.apparent_amplitude
                     else p["distance_modulus"])
        apparent = mags + ext_mag[:, None] + dist_corr + redshift_correction

        # rows with <2 finite samples are unusable -> all-inf
        # (nmma/em/model.py:389-396)
        finite_count = jnp.sum(jnp.isfinite(apparent), axis=1, keepdims=True)
        apparent = jnp.where(finite_count >= 2, apparent, jnp.inf)
        return observable_times, apparent
