"""Injection machinery: reading injection sets + forward data synthesis.

Counterpart of the reference's injection plumbing: bilby-style injection
json files (dataframe-encoded dicts, ``nmma/core/utils.py:84-96``), forward
light-curve simulation with Gaussian noise and detection limits encoded as
(limiting-mag, inf-error) non-detections
(``create_light_curve_data`` / ``adjust_lc_for_observations``,
``nmma/em/lightcurve_generation.py:816-917``), and prior-draw injection
creation with constraint/ejecta test-and-redraw loops
(``NMMAInjectionCreator``, ``nmma/joint/injection_handling.py``).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def read_injection_file(path, reference_frequency=20.0):
    """Injection file -> dict of parameter arrays.

    json: bilby dataframe format. .xml/.xml.gz: legacy LIGO-LW
    sim_inspiral tables (reference file_to_dataframe,
    nmma/joint/injection_handling.py:361-418) via the stdlib parser.
    """
    path = str(path)
    if path.endswith((".xml", ".xml.gz")):
        from .io.ligolw import sim_inspiral_to_injections
        return sim_inspiral_to_injections(
            path, reference_frequency=reference_frequency)
    with open(path) as f:
        data = json.load(f)
    content = data["injections"]["content"] if "injections" in data else data
    return {k: np.asarray(v) for k, v in content.items()}


def read_injection_entry(path, index=0):
    table = read_injection_file(path)
    return {k: float(v[index]) if np.ndim(v[index]) == 0 else v[index]
            for k, v in table.items()}


def write_injection_file(path, parameters: dict):
    """Write a reference-compatible injection json."""
    n = len(next(iter(parameters.values())))
    content = {k: list(np.asarray(v).tolist()) for k, v in parameters.items()}
    content.setdefault("simulation_id", list(range(n)))
    payload = {"injections": {"__dataframe__": True, "content": content}}
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


def create_light_curve_data(injection_parameters, model, filters,
                            tmin=0.01, tmax=14.0, n_tsteps=150,
                            sample_times=None, seed=42,
                            injection_error_budget=0.1,
                            detection_limit=np.inf,
                            keep_infinite_data=False,
                            trigger_time=None,
                            ztf_sampling=False, rubin_too_type=None,
                            ztf_uncertainties=False, ztf_too=None):
    """Synthetic photometry from injection parameters.

    Reference semantics (lightcurve_generation.py:816-917): detector-frame
    model light curve -> Gaussian noise (injection error budget) ->
    detections below the limit, (limit, inf) pairs above it; padding-free
    per-filter dict output.
    """
    from .models import DetectorLightCurveModel, get_source_model

    rng = np.random.default_rng(seed)
    if sample_times is None:
        sample_times = np.geomspace(tmin, tmax, n_tsteps)
    lc_model = model if isinstance(model, DetectorLightCurveModel) else \
        DetectorLightCurveModel(model, filters, sample_times=sample_times)
    # jit ON THE HOST CPU: the eager detector map is one remote RPC per
    # op on the axon backend (tens of seconds for a single synthesis),
    # and remote compiles of single-point graphs have been measured at
    # minutes — one injection point belongs on the host
    import jax
    clean = {k: v for k, v in injection_parameters.items()
             if not isinstance(v, str)}
    with jax.default_device(jax.devices("cpu")[0]):
        obs_times, mags = jax.jit(lambda p: lc_model(p))(clean)
        obs_times = np.asarray(obs_times)
        mags = np.asarray(mags)

    if trigger_time is None:
        trigger_time = injection_parameters.get("trigger_time", 0.0)

    # data-driven ZTF survey simulation (reference adjust_data_for_ztf,
    # lightcurve_generation.py:968-1128): KDE-drawn epochs + limiting
    # magnitudes + skew-normal uncertainties from the packaged observing
    # statistics (falls back to the parametric cadence when the converted
    # artifact file is absent)
    if ztf_sampling or ztf_uncertainties or ztf_too:
        try:
            from .strategies import ZTFObservingModel
            ztf_model = ZTFObservingModel()
        except FileNotFoundError:
            ztf_model = None
        if ztf_model is not None:
            if np.isscalar(injection_error_budget):
                dmag = {f: float(injection_error_budget) for f in filters}
            else:
                dmag = dict(injection_error_budget)
            dense = {}
            for i, filt in enumerate(filters):
                noisy = mags[i] + rng.normal(scale=dmag[filt],
                                             size=mags.shape[1])
                dense[filt] = {
                    "time": obs_times + trigger_time, "mag": noisy,
                    "mag_error": np.full(mags.shape[1], dmag[filt])}
            data = ztf_model.apply(
                dense, filters, rng, float(np.max(obs_times)),
                trigger_time=trigger_time,
                uncertainties=ztf_uncertainties, too=ztf_too)
            if not keep_infinite_data:
                data = {f: {k: np.asarray(v)[np.isfinite(d["mag"])]
                            for k, v in d.items()}
                        for f, d in data.items()}
            return data

    # realistic telescope cadences (reference adjust_lc_for_telescopes,
    # lightcurve_generation.py:861-897)
    strategy = []
    if rubin_too_type:
        from .strategies import rubin_strategy
        strategy.extend(rubin_strategy(rubin_too_type))
    if ztf_sampling:
        from .strategies import ztf_strategy
        strategy.extend(ztf_strategy(rng))
    if strategy:
        from .strategies import apply_strategy
        true_data = {f: {"time": np.asarray(obs_times) + trigger_time,
                         "mag": mags[i]}
                     for i, f in enumerate(filters)}
        observed = apply_strategy(true_data, strategy,
                                  trigger_time=trigger_time)
        if np.isscalar(detection_limit) or detection_limit is None:
            limits = {f: float(detection_limit if detection_limit is not None
                               else np.inf) for f in observed}
        else:
            limits = dict(detection_limit)
        if np.isscalar(injection_error_budget):
            dmag = {f: float(injection_error_budget) for f in observed}
        else:
            dmag = dict(injection_error_budget)
        data = {}
        for filt, sub in observed.items():
            noisy = sub["mag"] + rng.normal(scale=dmag[filt],
                                            size=len(sub["mag"]))
            det_lim = limits.get(filt, np.inf)
            detected = noisy < det_lim
            mag_out = np.where(detected, noisy, det_lim)
            err_out = np.where(detected, dmag[filt], np.inf)
            if not keep_infinite_data:
                finite = np.isfinite(mag_out)
                data[filt] = {"time": sub["time"][finite],
                              "mag": mag_out[finite],
                              "mag_error": err_out[finite]}
            else:
                data[filt] = {"time": sub["time"], "mag": mag_out,
                              "mag_error": err_out}
        return data

    if np.isscalar(detection_limit) or detection_limit is None:
        limits = {f: float(detection_limit if detection_limit is not None
                           else np.inf) for f in filters}
    else:
        limits = dict(detection_limit)
    if np.isscalar(injection_error_budget):
        dmag = {f: float(injection_error_budget) for f in filters}
    else:
        dmag = dict(injection_error_budget)

    data = {}
    for i, filt in enumerate(filters):
        keep = obs_times >= 0.0
        times = obs_times[keep] + trigger_time
        true_mag = mags[i][keep]
        noisy = true_mag + rng.normal(scale=dmag[filt], size=len(true_mag))
        det_lim = limits.get(filt, np.inf)
        detected = noisy < det_lim
        mag_out = np.where(detected, noisy, det_lim)
        err_out = np.where(detected, dmag[filt], np.inf)
        if not keep_infinite_data:
            finite = np.isfinite(mag_out)
            times, mag_out, err_out = times[finite], mag_out[finite], \
                err_out[finite]
        data[filt] = {"time": times, "mag": mag_out, "mag_error": err_out}
    return data


class InjectionCreator:
    """Prior-draw injection sets with test-and-redraw loops.

    Counterpart of ``NMMAInjectionCreator``
    (nmma/joint/injection_handling.py:18-228): draw from the prior, run
    the conversion chain, apply tests (finite ejecta, SNR threshold,
    custom predicates), redraw failures up to ``max_redraws``.
    """

    def __init__(self, priors, conversion=None, tests=(), max_redraws=100,
                 seed=42):
        self.priors = priors
        self.conversion = conversion
        self.tests = list(tests)
        self.max_redraws = max_redraws
        self.key = jax.random.PRNGKey(seed)

    def _draw(self, n):
        self.key, sub = jax.random.split(self.key)
        u = jax.random.uniform(sub, (n, self.priors.ndim))
        params = self.priors.transform(u)
        if self.conversion is not None:
            params = self.conversion(params)
        return {k: np.asarray(v) for k, v in params.items()}

    def _passes(self, params):
        ok = np.ones(len(next(iter(params.values()))), dtype=bool)
        for test in self.tests:
            ok &= np.asarray(test(params))
        return ok

    def generate(self, n_injection):
        params = self._draw(n_injection)
        ok = self._passes(params)
        redraws = 0
        while not ok.all() and redraws < self.max_redraws:
            n_bad = int((~ok).sum())
            fresh = self._draw(n_bad)
            fresh_ok = self._passes(fresh)
            bad_idx = np.flatnonzero(~ok)
            take = bad_idx[:fresh_ok.sum()]
            src_idx = np.flatnonzero(fresh_ok)[:len(take)]
            for k in params:
                if k in fresh:
                    params[k][take] = fresh[k][src_idx]
            ok[take] = True
            redraws += 1
        if not ok.all():
            raise RuntimeError(
                f"{(~ok).sum()} injections still failing after "
                f"{self.max_redraws} redraws")
        return params


def finite_ejecta_test(params):
    """Reject draws whose conversion produced no ejecta (reference :274-280)."""
    return np.isfinite(np.asarray(params["log10_mej"])) & \
        (np.asarray(params["log10_mej"]) > -1e29)


def snr_test(gw_likelihood, threshold=8.0):
    """Network-SNR threshold test (reference test_snr, :283-344)."""
    def test(params):
        n = len(next(iter(params.values())))
        out = np.zeros(n, dtype=bool)
        for i in range(n):
            single = {k: float(v[i]) for k, v in params.items()
                      if np.ndim(v) >= 1}
            out[i] = float(gw_likelihood.optimal_snr(single)) >= threshold
        return out
    return test
