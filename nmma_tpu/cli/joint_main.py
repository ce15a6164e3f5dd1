"""``nmma-generation`` / ``nmma-analysis`` — the two-stage joint pipeline.

Counterpart of ``nmma/joint/generation.py`` + ``nmma/joint/main.py``:
the generation stage assembles everything the analysis needs (EM data,
GW strain, EOS set, priors, conversion instructions), test-evaluates the
likelihood once, and serializes a data dump; the analysis stage is pure
compute (deserialize -> jit -> sample), suitable for a TPU job.
"""

from __future__ import annotations

import argparse
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
                   required=True)
    p.add_argument("--injection-num", type=int, default=0)
    p.add_argument("--trigger-time", type=float, default=1187008882.4)
    p.add_argument("--gw-detectors", "--detectors", dest="detectors",
                   default="H1,L1,V1")
    p.add_argument("--duration", type=float, default=64.0)
    p.add_argument("--minimum-frequency", type=float, default=23.0)
    p.add_argument("--maximum-frequency", type=float, default=1024.0)
    p.add_argument("--em-model", "--kilonova-model", dest="em_model",
                   default=None)
    p.add_argument("--svd-path", default=None)
    p.add_argument("--filters", default="ztfg,ztfr")
    p.add_argument("--eos-data", "--eos-dir", dest="eos_data", default=None)
    p.add_argument("--em-tmin", dest="tmin", type=float, default=0.1)
    p.add_argument("--em-tmax", dest="tmax", type=float, default=14.0)
    p.add_argument("--generation-seed", type=int, default=42)
    p.add_argument("--em-error-budget", type=float, default=1.0)
    return p


def nmma_generation(cli_args=None):
    config, argv = check_for_config(cli_args)
    args = apply_config(_generation_parser(), config, argv)

    from .. import conversion as C
    from ..gw import GWTransientLikelihood, InterferometerData
    from ..injections import create_light_curve_data, read_injection_entry
    from ..priors import load_prior_file

    os.makedirs(args.outdir, exist_ok=True)
    from .parsing import write_complete_config
    write_complete_config(args)
    priors = load_prior_file(args.prior_file)
    injection = read_injection_entry(args.injection_file, args.injection_num)

    # conversion chain instructions
    injection = dict(injection)
    if "EOS" not in injection:
        # legacy (LIGO-LW xml) injections carry no tidal information;
        # zero-tidal is the standard default for sim_inspiral ingestion
        injection.setdefault("lambda_1", 0.0)
        injection.setdefault("lambda_2", 0.0)
    gw_only = args.em_model is None and "EOS" not in injection \
        and "ratio_zeta" not in injection
    chain = [C.bns_source_frame]
    eos_payload = None
    if args.eos_data:
        from ..eos import load_macro_eos_set
        eos_set = load_macro_eos_set(args.eos_data)
        chain.append(eos_set)
        eos_payload = args.eos_data
    elif not gw_only:
        chain.append(C.radii_from_qur)
    if not gw_only:
        # ejecta fitting needs EOS radii + disk-wind fractions; a pure-GW
        # injection (e.g. from a sim_inspiral xml) skips it
        chain.append(C.KilonovaEjectaFitting())
    conversion = C.MultimessengerConversion(*chain)
    inj_conv = conversion(injection)
    inj_scalar = {k: float(np.asarray(v)) for k, v in inj_conv.items()
                  if np.ndim(np.asarray(v)) == 0}

    # GW strain: zero-noise injection per detector
    ifos = [InterferometerData.zero_noise_injection(
        name, inj_scalar, duration=args.duration,
        f_min=args.minimum_frequency, f_max=args.maximum_frequency,
        trigger_time=args.trigger_time)
        for name in args.detectors.split(",")]

    # EM data from the converted injection
    em_data = None
    filters = args.filters.split(",")
    if args.em_model:
        if args.svd_path:
            from ..models.svd import SVDModelData, make_svd_source_model
            make_svd_source_model(args.em_model, SVDModelData.load(args.svd_path))
        em_data = create_light_curve_data(
            inj_scalar, model=args.em_model, filters=filters,
            tmin=max(args.tmin, 0.3), tmax=min(args.tmax, 12.0), n_tsteps=20,
            seed=args.generation_seed)

    dump = {
        "args": vars(args),
        "injection": injection,
        "ifos": ifos,
        "em_data": em_data,
        "eos_data": eos_payload,
        "prior_file": args.prior_file,
        "trigger_time": args.trigger_time,
    }
    path = os.path.join(args.outdir, f"{args.label}_data_dump.pickle")
    with open(path, "wb") as f:
        pickle.dump(dump, f)

    # test-build the likelihood with one evaluation (reference
    # generation.py:209-213)
    likelihood, priors = build_joint_likelihood(dump)
    import jax
    # jit: eager complex ops are UNIMPLEMENTED on the axon TPU backend
    logl = float(jax.jit(likelihood.log_likelihood)(inj_scalar))
    print(f"data dump written to {path}; test logL(injection) = {logl:.2f}")
    return path


def build_joint_likelihood(dump):
    from .. import conversion as C
    from ..gw import GWTransientLikelihood
    from ..joint import MultiMessengerLikelihood
    from ..likelihood import (EMLikelihood, PhotometryData, SystematicsModel)
    from ..models import DetectorLightCurveModel
    from ..priors import load_prior_file

    args = dump["args"]
    priors = load_prior_file(dump["prior_file"])

    gw_only = dump.get("em_data") is None \
        and "EOS" not in dump["injection"] \
        and "ratio_zeta" not in dump["injection"]
    chain = [C.bns_source_frame]
    if dump["eos_data"]:
        from ..eos import load_macro_eos_set
        chain.append(load_macro_eos_set(dump["eos_data"]))
    elif not gw_only:
        chain.append(C.radii_from_qur)
    if not gw_only:
        chain.append(C.KilonovaEjectaFitting())
    conversion = C.MultimessengerConversion(*chain)

    # relative binning around the injection (fiducial) waveform: ~300x
    # fewer waveform evaluations than the dense Whittle sum
    inj_conv = conversion(dict(dump["injection"]))
    fiducial = {k: float(np.asarray(v)) for k, v in inj_conv.items()
                if np.ndim(np.asarray(v)) == 0}
    from ..gw import RelativeBinningGWLikelihood
    try:
        gw_lk = RelativeBinningGWLikelihood(
            dump["ifos"], fiducial, trigger_time=dump["trigger_time"])
    except Exception:
        gw_lk = GWTransientLikelihood(dump["ifos"],
                                      trigger_time=dump["trigger_time"])
    likelihoods = [gw_lk]
    sanity = ()
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
        likelihoods.append(EMLikelihood(
            model, photo, filters,
            SystematicsModel(filters, error_budget=args["em_error_budget"])))
        sanity = ("log10_mej_dyn",)

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
    np.savez(os.path.join(args.outdir, f"{args.label}_result.npz"),
             logz=result.logz, logz_err=result.logz_err, ncall=result.ncall,
             **{f"posterior_{k}": np.asarray(v) for k, v in post.items()})
    print(f"log-evidence: {result.logz:.3f} +/- {result.logz_err:.3f}")
    return result


if __name__ == "__main__":
    raise SystemExit("invoke via nmma-generation / nmma-analysis")
