"""GW x EM joint resampling over (Mc, q, EOS, alpha, zeta).

Counterpart of ``gwem-resampling``
(``nmma/post_processing/resampling.py:53-240``): re-infer binary +
nuisance parameters by combining KDE densities of the GW posterior with
a KDE of the EM-inferred ejecta posterior, using the EOS-index
conversion chain between them. The reference drives pymultinest; here it
is the same vectorized nested sampler as every other analysis — the KDE
log-densities are jittable logsumexp kernels.

Reference conventions matched term for term (resampling.py:96-171):

* the GW chirp-mass KDE is built in the SOURCE frame — detector-frame
  chirp masses are divided by (1 + z(d_L)) when the posterior carries a
  ``luminosity_distance`` column (:96-98);
* the mass-ratio density is a KDE of 1/q evaluated at m1/m2 (:108);
* the EM ejecta KDE lives in LINEAR masses and is evaluated at
  (mdyn, mwind) (construct_EM_KDE; log-space evaluation would drop the
  m_dyn*m_wind Jacobian);
* GW EOS information enters through the per-EOS sample count of the GW
  posterior's ``EOS`` column, with hard rejection of EOS indices absent
  from it (:146, :160). When the GW posterior has no EOS column, this
  implementation falls back to a (Mc, q, lambda_tilde) KDE — a
  documented extension for EOS-column-less posteriors;
* the NSBH variant feeds chi_eff = (chi_1 + q chi_2)/(1 + q) to the
  ejecta fits and uses the remnant fit DIRECTLY as the disk mass
  (:121-157 — unlike the main conversion chain, which subtracts mdyn).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import conversion as C
from ..constants import geom_msun_km
from ..inference import NestedSampler, NestedSamplerConfig
from ..priors import PriorDict, Uniform
from .kde import GaussianKDE

NEG_INF = -1e30


def _linear_em_samples(em_samples, total_mode):
    """EM KDE training samples in LINEAR ejecta masses."""
    if total_mode:
        if "log10_mej" in em_samples:
            return 10.0 ** np.asarray(em_samples["log10_mej"])
        # reference combine_ejecta_mass branch: sum the components
        return (10.0 ** np.asarray(em_samples["log10_mej_dyn"])
                + 10.0 ** np.asarray(em_samples["log10_mej_wind"]))
    return np.column_stack([
        10.0 ** np.asarray(em_samples["log10_mej_dyn"]),
        10.0 ** np.asarray(em_samples["log10_mej_wind"])])


class GWEMResampler:
    def __init__(self, gw_samples, em_samples, eos_set,
                 total_ejecta_mass=False, with_nsbh=False,
                 priors=None, cosmology=None):
        """
        gw_samples : dict with chirp_mass (detector frame when a
            luminosity_distance column is present), mass_ratio, and
            either an EOS column (reference path) or lambda_tilde
            (fallback); ``with_nsbh=True`` additionally chi_1, chi_2.
        em_samples : dict with log10_mej_dyn/log10_mej_wind (or
            log10_mej for ``total_ejecta_mass``)
        eos_set : TabulatedEOSSet (the conversion step)
        priors : optional dict of prior overrides (the reference reads
            chirp_mass/mass_ratio/alpha/zeta ranges from prior files)
        """
        self.eos_set = eos_set
        self.with_nsbh = bool(with_nsbh)
        self.total_mode = total_ejecta_mass
        self.em_kde = GaussianKDE(_linear_em_samples(em_samples,
                                                     total_ejecta_mass))

        mc = np.asarray(gw_samples["chirp_mass"], dtype=np.float64)
        q = np.asarray(gw_samples["mass_ratio"], dtype=np.float64)
        if "luminosity_distance" in gw_samples:
            from ..cosmology import get_cosmology
            cosmo = cosmology or get_cosmology()
            z = np.asarray(cosmo.redshift_at_dl(jnp.asarray(
                gw_samples["luminosity_distance"], dtype=jnp.float32)),
                dtype=np.float64)
            mc = mc / (1.0 + z)

        self.mc_kde = GaussianKDE(mc)
        self.invq_kde = GaussianKDE(1.0 / q)

        # GW EOS information: per-EOS sample counts (reference :146) or
        # the lambda_tilde KDE fallback
        self._log_eos_counts = None
        self.lambda_kde = None
        if "EOS" in gw_samples:
            idx = np.clip(np.floor(np.asarray(
                gw_samples["EOS"], dtype=np.float64)).astype(int),
                0, eos_set.n_eos - 1)
            counts = np.bincount(idx, minlength=eos_set.n_eos).astype(
                np.float64)
            with np.errstate(divide="ignore"):
                logc = np.log(counts)
            self._log_eos_counts = jnp.asarray(
                np.where(counts > 0, logc, NEG_INF), dtype=jnp.float32)
        elif not self.with_nsbh:
            self.lambda_kde = GaussianKDE(
                np.asarray(gw_samples["lambda_tilde"], dtype=np.float64))

        prior_dict = {
            "chirp_mass": Uniform(minimum=float(mc.min()),
                                  maximum=float(mc.max())),
            "mass_ratio": Uniform(minimum=float(q.min()),
                                  maximum=float(min(q.max(), 1.0))),
            "EOS": Uniform(minimum=0.0, maximum=float(eos_set.n_eos)),
            "alpha": Uniform(minimum=-1e-3, maximum=1e-3),
            "ratio_zeta": Uniform(minimum=0.0, maximum=1.0),
        }
        if self.with_nsbh:
            chi1 = np.asarray(gw_samples["chi_1"], dtype=np.float64)
            chi2 = np.asarray(gw_samples["chi_2"], dtype=np.float64)
            self.chi1_kde = GaussianKDE(chi1)
            self.chi2_kde = GaussianKDE(chi2)
            prior_dict["chi_1"] = Uniform(minimum=float(chi1.min()),
                                          maximum=float(chi1.max()))
            prior_dict["chi_2"] = Uniform(minimum=float(chi2.min()),
                                          maximum=float(chi2.max()))
        if priors:
            prior_dict.update(priors)
        self.priors = PriorDict(prior_dict)

    def log_likelihood(self, params):
        p = dict(params)
        p = C.generate_mass_parameters(p)
        # the chirp-mass KDE is source frame, so the sampled masses ARE
        # source-frame masses
        p["mass_1_source"] = p["mass_1"]
        p["mass_2_source"] = p["mass_2"]
        p = self.eos_set(p)
        m1 = jnp.asarray(p["mass_1"])
        m2 = jnp.asarray(p["mass_2"])
        r1 = jnp.asarray(p["radius_1"])
        r2 = jnp.asarray(p["radius_2"])
        comp2 = m2 * geom_msun_km / jnp.maximum(r2, 1e-6)
        alpha = jnp.asarray(p["alpha"])
        zeta = jnp.asarray(p["ratio_zeta"])

        if self.with_nsbh:
            # reference NSBH resampler (:121-133): chi_eff drives the
            # fits; the remnant fit IS the disk mass
            chieff = C.chi_eff(m1, m2, jnp.asarray(p["chi_1"]),
                               jnp.asarray(p["chi_2"]))
            mdyn = C.nsbh_dynamic_mass(m1, m2, comp2, chieff) + alpha
            mdisk = C.nsbh_remnant_disk_mass(m1, m2, comp2, chieff)
            branch_ok = r2 > 0.0       # secondary supported as a NS
        else:
            comp1 = m1 * geom_msun_km / jnp.maximum(r1, 1e-6)
            mdyn = C.bns_dynamic_mass_krfo(m1, m2, comp1, comp2) + alpha
            log10_mdisk = C.bns_log10_disk_mass(
                m1 + m2, m2 / m1, p["TOV_mass"], p["R_16"] / geom_msun_km)
            mdisk = 10.0 ** log10_mdisk
            branch_ok = (r1 > 0.0) & (r2 > 0.0)
        mwind = zeta * mdisk

        logp = (self.mc_kde.logpdf(jnp.asarray(p["chirp_mass"]))
                + self.invq_kde.logpdf(m1 / m2))
        if self._log_eos_counts is not None:
            eos_idx = jnp.clip(jnp.floor(jnp.asarray(p["EOS"])), 0,
                               self._log_eos_counts.shape[0] - 1
                               ).astype(jnp.int32)
            logp = logp + self._log_eos_counts[eos_idx]
        elif self.lambda_kde is not None:
            lam_t = C.lambda_1_lambda_2_to_lambda_tilde(
                p["lambda_1"], p["lambda_2"], m1, m2)
            logp = logp + self.lambda_kde.logpdf(lam_t)
        if self.with_nsbh:
            logp = logp + self.chi1_kde.logpdf(jnp.asarray(p["chi_1"])) \
                + self.chi2_kde.logpdf(jnp.asarray(p["chi_2"]))

        if self.total_mode:
            em_logl = self.em_kde.logpdf(mdyn + mwind)
        else:
            em_logl = self.em_kde.logpdf(jnp.stack([mdyn, mwind]))

        logl = logp + em_logl
        ok = branch_ok & (mdyn > 0.0) & (mdisk > 0.0) & jnp.isfinite(logl)
        logl = jnp.where(ok, logl, NEG_INF)
        return jnp.where(jnp.isnan(logl), NEG_INF, logl)

    def run(self, nlive=512, verbose=False, **kwargs):
        def unit_logl(u):
            return self.log_likelihood(self.priors.transform(u))
        sampler = NestedSampler(
            jax.vmap(unit_logl), self.priors.ndim,
            NestedSamplerConfig(nlive=nlive,
                                n_delete=max(nlive // 8, 1), **kwargs))
        result = sampler.run(verbose=verbose)
        idx = result.posterior_indices()
        post = self.priors.transform(jnp.asarray(result.samples_u[idx]))
        return result, {k: np.asarray(v) for k, v in post.items()}
