"""EM-analysis orchestration: data -> model -> likelihood -> sampler.

TPU-native counterpart of ``nmma/em/analysis.py:110-173`` (analysis_setup)
and the ``bilby_sampling`` driver (``nmma/core/base.py:290-369``): instead
of assembling bilby objects around an external sampler, this composes a
pure unit-cube log-likelihood (prior transform -> parameter conversion ->
light-curve model -> photometric likelihood, all jitted together) and runs
the vectorized nested sampler on it.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .inference import NestedSampler, NestedSamplerConfig
from .io import (cut_data_to_time_range, load_em_observations,
                 remove_nondetections, shift_to_trigger_time)
from .likelihood import EMLikelihood, PhotometryData, SystematicsModel
from .models import DetectorLightCurveModel
from .priors import PriorDict, load_prior_file


@dataclass
class EMAnalysisConfig:
    model: str = "Me2017"
    prior_file: str = None
    light_curve_data: str = None
    trigger_time: float = 0.0
    data_tmin: float = 0.0
    data_tmax: float = np.inf
    filters: list = None
    tmin: float = 0.01
    tmax: float = 14.0
    n_tsteps: int = 150
    timescale: str = "log"       # model grid: 'log' (geomspace) | 'linear'
    extinction_law: str = "P92_SMC_host"
    time_format: str = "mjd"
    error_budget: float = 1.0
    systematics_file: str = None
    detection_limit: float = np.inf
    remove_nondetections: bool = False
    outdir: str = "outdir"
    label: str = "injection"
    # static kernel options forwarded to the source model (only the keys
    # the kernel's signature accepts), e.g. grb_resolution / jet_type
    model_kwargs: dict = field(default_factory=dict)
    sampler: NestedSamplerConfig = field(default_factory=NestedSamplerConfig)


class EMAnalysis:
    """Single-messenger photometric parameter estimation."""

    def __init__(self, config: EMAnalysisConfig, data=None, priors=None):
        self.config = config
        cfg = config

        if data is None:
            data = load_em_observations(cfg.light_curve_data,
                                        time_format=cfg.time_format)
        data = cut_data_to_time_range(data, cfg.trigger_time, cfg.data_tmin,
                                      cfg.data_tmax)
        data = shift_to_trigger_time(data, cfg.trigger_time)
        if cfg.remove_nondetections:
            data = remove_nondetections(data)
        if cfg.filters:
            data = {f: data[f] for f in cfg.filters if f in data}
        self.data_dict = data
        self.filters = sorted(data.keys())
        # detection check (reference check_detections, em/analysis.py:49-60)
        n_det = sum(int(np.sum(np.isfinite(
            np.atleast_1d(data[f]["mag_error"])))) for f in self.filters)
        if not self.filters or n_det == 0:
            raise ValueError(
                "no detections in the light-curve data after cuts/filter "
                "selection — nothing to fit (reference behavior: abort)")

        if cfg.timescale == "linear":
            sample_times = np.linspace(cfg.tmin, cfg.tmax, cfg.n_tsteps)
        else:
            sample_times = np.geomspace(cfg.tmin, cfg.tmax, cfg.n_tsteps)
        self.model = DetectorLightCurveModel(
            cfg.model, self.filters, sample_times=sample_times,
            extinction_law=cfg.extinction_law,
            model_kwargs=cfg.model_kwargs)

        if priors is None:
            from .priors import adjust_priors_for_nmma
            priors = adjust_priors_for_nmma(load_prior_file(cfg.prior_file))
        self.priors: PriorDict = priors

        photo, _ = PhotometryData.from_dict(data, self.filters)
        systematics = SystematicsModel(
            self.filters, cfg.systematics_file, cfg.error_budget,
            model_time_range=(cfg.tmin, cfg.tmax))
        # yaml-requested systematics parameters join the sampled priors
        # (reference create_prior_from_args wiring, em/prior.py:221-244)
        sys_priors = systematics.create_priors()
        if sys_priors:
            merged = dict(self.priors.priors)
            merged.update(sys_priors)
            self.priors = PriorDict(merged)
        systematics.finalize(list(self.priors.keys()))
        self.likelihood = EMLikelihood(
            self.model, photo, self.filters, systematics,
            detection_limit=cfg.detection_limit)

        self._batched_logl = jax.vmap(self._unit_logl)

    # -- pure composition ---------------------------------------------------
    def _unit_logl(self, u):
        params = self.priors.transform(u)
        logl = self.likelihood.log_likelihood(params)
        constraint = self.priors.constraint_log_prob(params)
        return jnp.where(jnp.isfinite(constraint), logl, -1e30)

    # largest single-dispatch batch: the dense interpolation intermediate
    # is [B, F, N, T]; past ~2 GiB a buffer silently corrupts on the
    # current TPU runtime (int32 linearised indexing), observed at
    # B > 8192 on the AT2017gfo 9-filter config — so bigger batches are
    # split into sequential sub-launches of this size
    MAX_DISPATCH_BATCH = 8192

    def batched_logl(self, u_batch):
        b = u_batch.shape[0]
        cap = self.MAX_DISPATCH_BATCH
        if b <= cap:
            return self._batched_logl(u_batch)
        n_chunks = -(-b // cap)
        pad = n_chunks * cap - b
        padded = jnp.concatenate(
            [u_batch, jnp.full((pad, u_batch.shape[1]), 0.5,
                               dtype=u_batch.dtype)]) if pad else u_batch
        out = jax.lax.map(self._batched_logl,
                          padded.reshape(n_chunks, cap, -1))
        return out.reshape(-1)[:b]

    # -- driver -------------------------------------------------------------
    def run(self, verbose=True, checkpoint=True):
        cfg = self.config
        os.makedirs(cfg.outdir, exist_ok=True)
        sampler = NestedSampler(self.batched_logl, self.priors.ndim,
                                cfg.sampler)
        ckpt = os.path.join(cfg.outdir,
                            f"{cfg.label}_checkpoint_resume.npz") \
            if checkpoint else None
        result = sampler.run(verbose=verbose, checkpoint_path=ckpt,
                             resume=checkpoint)
        self.result = result
        self.save_result()
        return result

    def run_mcmc(self, mcmc_config=None, verbose=True):
        """Posterior via the affine-invariant ensemble sampler — an
        independent cross-check of the nested sampler (no evidence; the
        reference's multi-sampler surface, nmma/em/analysis.py
        ``--sampler``). Returns the posterior dict and stores the
        EnsembleMCMCResult on ``self.mcmc_result``."""
        from .inference import EnsembleMCMC, EnsembleMCMCConfig
        cfg = self.config
        os.makedirs(cfg.outdir, exist_ok=True)
        mcfg = mcmc_config or EnsembleMCMCConfig(seed=cfg.sampler.seed)
        sampler = EnsembleMCMC(self.batched_logl, self.priors.ndim, mcfg)
        res = sampler.run(verbose=verbose)
        self.mcmc_result = res
        max_rhat = float(np.nanmax(res.rhat))
        if max_rhat > 1.1:
            print(f"WARNING: ensemble-mcmc max R-hat {max_rhat:.3f} > 1.1 "
                  f"— chains not converged; increase sweeps (e.g. "
                  f"--mcmc-sweeps {2 * mcfg.sweeps}) or use the nested "
                  f"sampler", flush=True)
        # MCMC draws are equal-weight, so the shared posterior path
        # (posterior_indices -> jitted prior transform) applies directly
        post = self.posterior_samples(result=res)
        np.savez(os.path.join(cfg.outdir, f"{cfg.label}_mcmc_result.npz"),
                 acceptance=res.acceptance, rhat=res.rhat,
                 ncall=res.n_call, logz=res.logz, logz_err=res.logz_err,
                 **{f"posterior_{k}": v for k, v in post.items()})
        from .io.results import save_posterior_csv
        save_posterior_csv(
            os.path.join(cfg.outdir,
                         f"{cfg.label}_mcmc_posterior_samples.csv"), post)
        return post

    # -- posterior ----------------------------------------------------------
    def posterior_samples(self, result=None, rng=None):
        result = result or self.result
        idx = result.posterior_indices(rng)
        u = jnp.asarray(result.samples_u[idx])
        # jit: eager per-parameter transforms are one remote RPC each on
        # the axon backend (seconds/op); one compiled call instead
        params = jax.jit(self.priors.transform)(u)
        out = {k: np.asarray(v) for k, v in params.items()}
        out["log_likelihood"] = result.logl[idx]
        return out

    def bestfit_parameters(self, result=None):
        result = result or self.result
        i_best = int(np.argmax(result.logl))
        u = jnp.asarray(result.samples_u[i_best])
        params = jax.jit(self.priors.transform)(u)
        host = jax.device_get(params)
        return {k: float(np.asarray(v)) for k, v in host.items()}

    def save_result(self, result=None):
        cfg = self.config
        result = result or self.result
        post = self.posterior_samples(result)
        np.savez(os.path.join(cfg.outdir, f"{cfg.label}_result.npz"),
                 logz=result.logz, logz_err=result.logz_err,
                 ncall=result.ncall, niter=result.niter,
                 **{f"posterior_{k}": v for k, v in post.items()})
        # result metadata sidecar (reference stores args/versions in every
        # result, mpi_setup.py:497-512 / generation.py:42-49)
        from dataclasses import asdict
        import nmma_tpu
        meta = {
            "nmma_tpu_version": nmma_tpu.__version__,
            "jax_version": __import__("jax").__version__,
            "config": {k: (v if isinstance(v, (int, float, str, bool,
                                               type(None), list)) else str(v))
                       for k, v in asdict(cfg).items()},
            "log_evidence": result.logz,
            "log_evidence_err": result.logz_err,
            "num_likelihood_evaluations": result.ncall,
            "sampling_time_iterations": result.niter,
            "parameters": self.priors.sampled_names,
        }
        with open(os.path.join(cfg.outdir, f"{cfg.label}_result_meta.json"),
                  "w") as f:
            json.dump(meta, f, indent=2, default=str)
        from .io.results import save_posterior_csv
        save_posterior_csv(
            os.path.join(cfg.outdir, f"{cfg.label}_posterior_samples.dat"
                         ).replace(".dat", ".csv"), post)
        bestfit = self.bestfit_parameters(result)
        bestfit["log_likelihood"] = float(result.logl.max())
        bestfit["log_evidence"] = result.logz
        bestfit["log_evidence_err"] = result.logz_err
        with open(os.path.join(cfg.outdir, f"{cfg.label}_bestfit_params.json"),
                  "w") as f:
            json.dump(bestfit, f, indent=2)
