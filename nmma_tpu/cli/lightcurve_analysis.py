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
    if args.svd_path:
        svd = SVDModelData.load(args.svd_path)
        source = make_svd_source_model(model_name, svd,
                                       mag_ncoeff=args.svd_mag_ncoeff)
        model_name = source.name

    data = None
    trigger_time = args.trigger_time or 0.0
    if args.injection:
        data, injection_parameters, trigger_time = data_from_injection(args)

    cfg = EMAnalysisConfig(
        model=model_name,
        prior_file=args.prior,
        light_curve_data=args.light_curve_data,
        trigger_time=trigger_time,
        data_tmin=args.data_tmin, data_tmax=args.data_tmax,
        filters=args.filters.split(",") if args.filters else None,
        tmin=args.tmin, tmax=args.tmax, n_tsteps=args.n_tsteps,
        error_budget=args.em_error_budget,
        systematics_file=args.systematics_file,
        detection_limit=args.detection_limit,
        remove_nondetections=args.remove_nondetections,
        outdir=args.outdir, label=args.label,
        sampler=sampler_config_from_args(args),
    )
    analysis = EMAnalysis(cfg, data=data)
    if args.skip_sampling:
        print("--skip-sampling: likelihood assembled; exiting before PE.")
        return analysis
    result = analysis.run(verbose=True)
    print(f"log-evidence: {result.logz:.3f} +/- {result.logz_err:.3f} "
          f"({result.ncall} likelihood calls)")
    return analysis


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
        entry, model=args.model, filters=filters, tmin=args.tmin,
        tmax=args.tmax, seed=args.generation_seed,
        detection_limit=args.detection_limit)
    return data, entry, trigger_time


if __name__ == "__main__":
    main()
