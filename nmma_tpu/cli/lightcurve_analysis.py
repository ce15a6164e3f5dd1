"""``lightcurve-analysis`` — EM-only parameter estimation CLI.

Counterpart of ``nmma.em.analysis:main`` (reference call stack SURVEY.md
§3.1): config-file-first parsing, data-or-injection setup, model +
likelihood assembly, nested sampling, posterior artifacts.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .parsing import (apply_config, base_analysis_parser, check_for_config,
                      sampler_config_from_args)


def main(cli_args=None):
    config, argv = check_for_config(cli_args)
    parser = base_analysis_parser("EM transient parameter estimation")
    args = apply_config(parser, config, argv)

    from .multi import expand_runs
    sub_runs = expand_runs(args)
    if len(sub_runs) > 1:
        out = None
        for run_args in sub_runs:
            print(f"=== sub-run {run_args.label} ===")
            out = _single_run(run_args)
        return out
    return _single_run(args)


def _single_run(args):
    import jax  # deferred so --help is instant
    from ..analysis import EMAnalysis, EMAnalysisConfig
    from ..models.svd import SVDModelData, make_svd_source_model

    model_name = args.model
    fiesta_data = None
    if args.svd_path:
        svd = SVDModelData.load(args.svd_path)
        source = make_svd_source_model(model_name, svd,
                                       mag_ncoeff=args.svd_mag_ncoeff)
        model_name = source.name
    else:
        # fiesta surrogate resolution: unknown model names fall through
        # to the fiesta surrogates directory (reference --em-model with
        # FiestaKilonovaModel/FiestaGRBModel, nmma/em/model.py:734-888)
        import os as _os

        from ..models.base import get_source_model
        from ..models.fiesta import (FIESTA_ENV, load_fiesta_surrogate,
                                     make_fiesta_source_model)
        fiesta_dir = getattr(args, "fiesta_surrogates_dir", None) or \
            _os.environ.get(FIESTA_ENV)
        try:
            get_source_model(model_name)
            known = True
        except KeyError:
            known = False
        if not known and fiesta_dir:
            try:
                fdata = load_fiesta_surrogate(
                    model_name, fiesta_dir,
                    filters=args.filters.split(",") if args.filters
                    else None)
            except FileNotFoundError:
                fdata = None
            if fdata is not None:
                make_fiesta_source_model(model_name, fdata)
        # the support guard applies whether the surrogate was resolved
        # just now or registered by an earlier run in this process
        from ..models.fiesta import registered_fiesta_data
        fiesta_data = registered_fiesta_data(model_name)

    data = None
    trigger_time = args.trigger_time or 0.0
    if args.injection:
        data, injection_parameters, trigger_time = data_from_injection(args)
    if getattr(args, "injection_model", None) and not args.injection:
        raise ValueError("--injection-model needs --injection")

    if getattr(args, "detection_limit_fits_file", None):
        if args.ra is None or args.dec is None:
            raise ValueError(
                "--detection-limit-fits-file needs --ra and --dec")
        from ..io.fits import detection_limit_from_m4opt_fits
        args.detection_limit = detection_limit_from_m4opt_fits(
            args.detection_limit_fits_file, args.ra, args.dec)
        print(f"detection limit from m4opt map: "
              f"{args.detection_limit:.2f} mag")

    n_tsteps = args.n_tsteps
    if getattr(args, "tstep", None):
        # reference quick-start --dt convention: linear step over the
        # model window (grid density equivalent on our geomspace grid)
        n_tsteps = max(int(round((args.tmax - args.tmin) / args.tstep)) + 1,
                       8)
    cfg = EMAnalysisConfig(
        model=model_name,
        prior_file=args.prior,
        light_curve_data=args.light_curve_data,
        trigger_time=trigger_time,
        data_tmin=args.data_tmin, data_tmax=args.data_tmax,
        filters=args.filters.split(",") if args.filters else None,
        tmin=args.tmin, tmax=args.tmax, n_tsteps=n_tsteps,
        timescale=getattr(args, "timescale", "log"),
        extinction_law=getattr(args, "extinction_law", "P92_SMC_host"),
        time_format=getattr(args, "time_format", "mjd"),
        error_budget=args.em_error_budget,
        systematics_file=args.systematics_file,
        detection_limit=args.detection_limit,
        remove_nondetections=args.remove_nondetections,
        outdir=args.outdir, label=args.label,
        model_kwargs={k: v for k, v in {
            "grb_resolution": args.grb_resolution,
            "jet_type": args.jet_type,
            "n_theta": getattr(args, "grb_ntheta", None),
            "n_phi": getattr(args, "grb_nphi", None),
            "n_r": getattr(args, "grb_nr", None),
            "spread": False if getattr(args, "grb_no_spread", False)
            else None,
        }.items() if v is not None},
        sampler=sampler_config_from_args(args),
    )
    if getattr(args, "fetch_Ebv_from_dustmap", False):
        raise RuntimeError(
            "--fetch-Ebv-from-dustmap needs the dustmaps SFD data, which "
            "requires network access unavailable in this environment; "
            "pass --Ebv-max or a fixed Ebv in the prior file instead")
    priors = None
    shaping = (getattr(args, "ebv_max", 0.0) > 0.0
               or getattr(args, "use_ebv", False)
               or getattr(args, "conditional_gaussian_prior_thetaobs",
                          False)
               or getattr(args, "ignore_timeshift", False)
               or getattr(args, "redshift", None) is not None)
    if shaping:
        # prior composition (reference create_prior_from_args,
        # em/prior.py:221-244) + timeshift/redshift surgery
        from ..priors.astro import create_prior_from_args
        from ..priors.core import DeltaFunction, PriorDict
        priors = create_prior_from_args(
            args.prior,
            Ebv_max=args.ebv_max if args.ebv_max > 0 else 0.5724,
            use_Ebv=bool(args.ebv_max > 0 or args.use_ebv),
            conditional_gaussian_prior_thetaObs=bool(
                args.conditional_gaussian_prior_thetaobs),
            conditional_gaussian_prior_N_sigma=float(
                args.conditional_gaussian_prior_n_sigma))
        pd = dict(priors.priors)
        if getattr(args, "ignore_timeshift", False):
            pd["timeshift"] = DeltaFunction(peak=0.0, name="timeshift")
        if getattr(args, "redshift", None) is not None:
            pd["redshift"] = DeltaFunction(peak=float(args.redshift),
                                           name="redshift")
        priors = PriorDict(pd)
    if args.fits_file:
        # skymap-driven inclination prior (reference prior.py:80-171)
        from ..priors import load_prior_file
        from ..priors.astro import inclination_prior_from_fits
        from ..priors.core import PriorDict
        priors = dict(priors.priors) if priors is not None else \
            dict(load_prior_file(args.prior).priors)
        dL = args.dL
        if dL is None:
            lum = priors.get("luminosity_distance")
            dL = getattr(lum, "peak", None)
            if dL is None:
                raise ValueError(
                    "--fits-file needs --dL or a delta-function "
                    "luminosity_distance in the prior file")
        priors["inclination_EM"] = inclination_prior_from_fits(
            args.fits_file, dL=float(dL), ra=args.ra, dec=args.dec,
            cosiota_node_num=args.cosiota_node_num)
        print(f"inclination_EM prior built from {args.fits_file} "
              f"at dL={float(dL):.1f} Mpc")
        priors = PriorDict(priors)
    if fiesta_data is not None:
        # reference FiestaModel raises at construction when the prior
        # extends beyond the trained support (nmma/em/model.py:434-445) —
        # out-of-support draws would silently extrapolate the MLP
        from ..priors import load_prior_file
        fiesta_data.check_vs_priors(
            priors if priors is not None else load_prior_file(args.prior))
    analysis = EMAnalysis(cfg, data=data, priors=priors)
    from .parsing import write_complete_config
    write_complete_config(args)
    if args.sampler == "neuralnet":
        # likelihood-free inference (reference --sampler neuralnet,
        # em/analysis.py:176-307): amortized flow posterior
        import numpy as _np

        from ..mlmodel.inference import nnanalysis
        post, _ = nnanalysis(
            analysis, seed=args.seed, verbose=args.verbose,
            pretrained_embedding=getattr(args, "lfi_pretrained_embedding",
                                         False),
            vicreg_pretrain=getattr(args, "lfi_vicreg_pretrain", False),
            vicreg_epochs=getattr(args, "lfi_vicreg_epochs", 60))
        _np.savez(os.path.join(cfg.outdir, f"{cfg.label}_result.npz"),
                  sampler="neuralnet",
                  **{f"posterior_{k}": _np.asarray(v)
                     for k, v in post.items()})
        print(f"neuralnet posterior: {len(next(iter(post.values())))} "
              f"samples written to {cfg.outdir}/{cfg.label}_result.npz")
        analysis.neuralnet_posterior = post
        return analysis
    if args.sampler == "mcmc":
        # affine-invariant ensemble MCMC: independent posterior
        # cross-check of the nested sampler
        import numpy as _np
        if args.skip_sampling:
            print("--skip-sampling: likelihood assembled; exiting before "
                  "MCMC (the ensemble sampler keeps no resume "
                  "checkpoint to regenerate from).")
            return analysis
        from ..inference import EnsembleMCMCConfig
        mcfg = EnsembleMCMCConfig(
            walkers=getattr(args, "mcmc_walkers", 256),
            sweeps=getattr(args, "mcmc_sweeps", 1500),
            temps=getattr(args, "mcmc_temps", 1),
            seed=args.seed)
        post = analysis.run_mcmc(mcmc_config=mcfg, verbose=args.verbose)
        res = analysis.mcmc_result
        print(f"mcmc posterior: {len(next(iter(post.values())))} samples "
              f"written to {cfg.outdir}/{cfg.label}_mcmc_result.npz "
              f"(max R-hat {float(_np.nanmax(res.rhat)):.3f})")
        if args.bestfit:
            from ..plotting import post_process_bestfit
            post_process_bestfit(analysis, result=res)
        if args.plot:
            from ..plotting import corner_plot, lightcurve_fit_plot
            lightcurve_fit_plot(analysis, result=res)
            corner_plot(post,
                        save_path=os.path.join(
                            cfg.outdir, f"{cfg.label}_corner.png"))
        return analysis
    if args.skip_sampling:
        # with an existing checkpoint, regenerate result artifacts/plots
        # from it without further sampling (reference --skip-sampling
        # semantics, nmma/core/base.py:307-314)
        from ..inference import NestedSampler
        ckpt = os.path.join(cfg.outdir,
                            f"{cfg.label}_checkpoint_resume.npz")
        if os.path.exists(ckpt):
            sampler = NestedSampler(analysis.batched_logl,
                                    analysis.priors.ndim, cfg.sampler)
            state, dead = sampler.load_checkpoint(ckpt)
            analysis.result = sampler._finalise(state, *dead)
            analysis.save_result()
            print(f"--skip-sampling: result regenerated from {ckpt} "
                  f"(logz={analysis.result.logz:.3f}).")
            if args.bestfit:
                from ..plotting import post_process_bestfit
                post_process_bestfit(analysis)
            if args.plot:
                from ..plotting import lightcurve_fit_plot
                lightcurve_fit_plot(analysis)
            return analysis
        print("--skip-sampling: likelihood assembled; exiting before PE "
              "(no checkpoint found to regenerate from).")
        return analysis
    result = analysis.run(verbose=True)
    print(f"log-evidence: {result.logz:.3f} +/- {result.logz_err:.3f} "
          f"({result.ncall} likelihood calls)")
    if args.bestfit:
        from ..plotting import post_process_bestfit
        post_process_bestfit(analysis)
    if args.plot:
        from ..plotting import corner_plot, lightcurve_fit_plot
        lightcurve_fit_plot(analysis)
        corner_plot(analysis.posterior_samples(),
                    save_path=os.path.join(cfg.outdir,
                                           f"{cfg.label}_corner.png"))
    return analysis


def lbol_main(cli_args=None):
    """``lightcurve-analysis-lbol`` — bolometric (Arnett) PE.

    Counterpart of ``nmma.em.analysis:lbol_main`` + ``bolometric_setup``
    (em/analysis.py:72-108): csv with phase/Lbb/Lbb_unc columns.
    """
    config, argv = check_for_config(cli_args)
    parser = base_analysis_parser("Bolometric light-curve PE")
    args = apply_config(parser, config, argv)

    import jax
    import pandas as pd

    from ..inference import NestedSampler
    from ..likelihood.bolometric import BolometricLikelihood
    from ..models import DetectorLightCurveModel
    from ..priors import load_prior_file

    df = pd.read_csv(args.light_curve_data)
    order = np.argsort(df["phase"].to_numpy())
    times = df["phase"].to_numpy()[order] - (args.trigger_time or 0.0)
    lbol = df["Lbb"].to_numpy()[order]
    lbol_err = df["Lbb_unc"].to_numpy()[order]

    model = DetectorLightCurveModel(args.model or "Arnett", [])
    likelihood = BolometricLikelihood(model, times, lbol, lbol_err)
    priors = load_prior_file(args.prior)

    def unit_logl(u):
        return likelihood(priors.transform(u))

    from .parsing import sampler_config_from_args
    sampler = NestedSampler(jax.vmap(unit_logl), priors.ndim,
                            sampler_config_from_args(args))
    os.makedirs(args.outdir, exist_ok=True)
    result = sampler.run(verbose=args.verbose)
    print(f"log-evidence: {result.logz:.3f} +/- {result.logz_err:.3f}")
    import jax.numpy as jnp
    idx = result.posterior_indices()
    post = priors.transform(jnp.asarray(result.samples_u[idx]))
    np.savez(os.path.join(args.outdir, f"{args.label}_result.npz"),
             logz=result.logz, logz_err=result.logz_err,
             **{f"posterior_{k}": np.asarray(v) for k, v in post.items()})
    return result


def data_from_injection(args):
    """Synthesize photometry from an injection file entry.

    Counterpart of ``em/analysis.py:data_from_injection`` (:18-31) using
    the forward light-curve simulator.
    """
    from ..injections import create_light_curve_data, read_injection_entry
    entry = read_injection_entry(args.injection, args.injection_num)
    trigger_time = entry.get("trigger_time", 0.0)
    filters = args.filters.split(",") if args.filters else ["ztfg", "ztfr",
                                                            "ztfi"]
    data = create_light_curve_data(
        entry, model=getattr(args, "injection_model", None) or args.model,
        filters=filters, tmin=args.tmin,
        tmax=args.tmax, seed=args.generation_seed,
        injection_error_budget=getattr(args, "injection_error_budget",
                                       0.1),
        detection_limit=args.detection_limit,
        ztf_sampling=getattr(args, "ztf_sampling", False),
        ztf_uncertainties=getattr(args, "ztf_uncertainties", False),
        ztf_too=getattr(args, "ztf_too", None),
        rubin_too_type=getattr(args, "rubin_too_type", None))
    if getattr(args, "injection_outfile", None):
        from ..io import write_em_observations
        os.makedirs(os.path.dirname(args.injection_outfile) or ".",
                    exist_ok=True)
        write_em_observations(args.injection_outfile, data)
    return data, entry, trigger_time


if __name__ == "__main__":
    main()
