"""Maximum-mass (post-merger remnant) inference.

Counterpart of ``maximum_mass_resampling``
(``nmma/post_processing/maximum_mass_constraint.py:76-216``): sample over
the joint GW+EM posterior KDE of (chirp_mass, eta_star, EOS, log10_mdisk,
log10_mej_dyn) under the constraint that the baryonic remnant mass
exceeds the collapse threshold (baryonic TOV mass, or the Kepler-limit
QUR when sampling ratio_R/delta). The per-EOS baryonic-mass curves are
precomputed host-side (``eos.baryonic``); the likelihood is pure jnp.
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..eos.baryonic import stacked_baryonic_tables
from ..inference import NestedSampler, NestedSamplerConfig
from ..priors import PriorDict, Uniform
from .kde import GaussianKDE

NEG_INF = -1e30


class MaximumMassResampler:
    def __init__(self, posterior_samples, eos_path_macro, eos_path_micro,
                 n_eos=None, use_m_max=False, mass_grid=None):
        """posterior_samples: dict with chirp_mass, eta_star, EOS,
        log10_mdisk, log10_mej_dyn arrays (the joint GW+EM posterior)."""
        self.use_m_max = use_m_max
        keys = ("chirp_mass", "eta_star", "EOS", "log10_mdisk",
                "log10_mej_dyn")
        self.kde = GaussianKDE(np.column_stack(
            [np.asarray(posterior_samples[k]) for k in keys]))

        macro_files = sorted(
            glob.glob(os.path.join(eos_path_macro, "*.dat")),
            key=lambda f: int(os.path.splitext(os.path.basename(f))[0]))
        micro_files = sorted(
            glob.glob(os.path.join(eos_path_micro, "*.dat")),
            key=lambda f: int(os.path.splitext(os.path.basename(f))[0]))
        if n_eos:
            macro_files, micro_files = macro_files[:n_eos], micro_files[:n_eos]
        self.n_eos = len(macro_files)

        if mass_grid is None:
            mass_grid = np.linspace(0.8, 2.6, 64)
        self.mass_grid = mass_grid
        mb_tables, mb_tov = stacked_baryonic_tables(macro_files, micro_files,
                                                    mass_grid)
        self.mb_tables = jnp.asarray(np.nan_to_num(mb_tables, nan=1e6))
        self.mb_tov = jnp.asarray(mb_tov)
        mtov, r14 = [], []
        for f in macro_files:
            r, m = np.loadtxt(f, unpack=True, usecols=[0, 1])
            mtov.append(m.max())
            r14.append(np.interp(1.4, m, r))
        self.mtov = jnp.asarray(mtov)
        self.r14 = jnp.asarray(r14)

        samples = {k: np.asarray(posterior_samples[k]) for k in keys}
        priors = {
            "chirp_mass": Uniform(minimum=float(samples["chirp_mass"].min()),
                                  maximum=float(samples["chirp_mass"].max())),
            "eta_star": Uniform(minimum=float(samples["eta_star"].min()),
                                maximum=float(samples["eta_star"].max())),
            "EOS": Uniform(minimum=0.0, maximum=float(self.n_eos)),
            "log10_mdisk": Uniform(
                minimum=float(samples["log10_mdisk"].min()),
                maximum=float(samples["log10_mdisk"].max())),
            "log10_mej_dyn": Uniform(
                minimum=float(samples["log10_mej_dyn"].min()),
                maximum=float(samples["log10_mej_dyn"].max())),
        }
        if use_m_max:
            priors["ratio_R"] = Uniform(minimum=1.0, maximum=1.4)
            priors["delta"] = Uniform(minimum=-0.05, maximum=0.05)
        self.priors = PriorDict(priors)

    def log_likelihood(self, p):
        mc = jnp.asarray(p["chirp_mass"])
        eta_star = jnp.asarray(p["eta_star"])
        eos = jnp.asarray(p["EOS"])
        log10_mdisk = jnp.asarray(p["log10_mdisk"])
        log10_mej = jnp.asarray(p["log10_mej_dyn"])

        log_prior = self.kde.logpdf(
            jnp.stack([mc, eta_star, eos, log10_mdisk, log10_mej]))

        # eta_star = log(0.25 - eta) parameterization (reference :137)
        eta = 0.25 - jnp.exp(eta_star)
        q = (1 - jnp.sqrt(jnp.maximum(1 - 4 * eta, 0.0)) - 2 * eta) / \
            (2 * eta)
        total = mc / jnp.power(eta, 3.0 / 5.0)
        m1 = total / (1 + q)
        m2 = total * q / (1 + q)

        idx = jnp.clip(jnp.floor(eos).astype(jnp.int32), 0, self.n_eos - 1)
        mb_row = self.mb_tables[idx]
        b1 = jnp.interp(m1, self.mass_grid, mb_row)
        b2 = jnp.interp(m2, self.mass_grid, mb_row)
        m_rem_b = b1 + b2 - 10.0**log10_mdisk - 10.0**log10_mej

        if self.use_m_max:
            from ..eos.baryonic import baryonic_kepler_mass
            m_threshold = baryonic_kepler_mass(
                self.mtov[idx], self.r14[idx], jnp.asarray(p["ratio_R"]),
                jnp.asarray(p["delta"]))
        else:
            m_threshold = self.mb_tov[idx]

        # remnant collapsed to a BH => threshold must lie below remnant
        logl = jnp.where(m_threshold > m_rem_b, NEG_INF, 0.0)
        out = log_prior + logl
        return jnp.where(jnp.isnan(out), NEG_INF, jnp.maximum(out, NEG_INF))

    def run(self, nlive=256, verbose=False, **kwargs):
        def unit_logl(u):
            return self.log_likelihood(self.priors.transform(u))
        sampler = NestedSampler(
            jax.vmap(unit_logl), self.priors.ndim,
            NestedSamplerConfig(nlive=nlive, n_delete=max(nlive // 8, 1),
                                **kwargs))
        result = sampler.run(verbose=verbose)
        idx = result.posterior_indices()
        post = self.priors.transform(jnp.asarray(result.samples_u[idx]))
        return result, {k: np.asarray(v) for k, v in post.items()}
