"""GW x EM joint resampling over (Mc, q, EOS, alpha, zeta).

Counterpart of ``gwem-resampling``
(``nmma/post_processing/resampling.py:53-240``): re-infer binary +
nuisance parameters by combining a KDE of the GW posterior (chirp mass,
mass ratio, effective tidal deformability) with a KDE of the EM-inferred
ejecta posterior (log10 dynamical / wind ejecta masses), using the
EOS-index conversion chain between them. The reference drives pymultinest;
here it is the same vectorized nested sampler as every other analysis —
the KDE log-densities are jittable logsumexp kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import conversion as C
from ..inference import NestedSampler, NestedSamplerConfig
from ..priors import PriorDict, Uniform
from .kde import GaussianKDE

NEG_INF = -1e30


class GWEMResampler:
    def __init__(self, gw_samples, em_samples, eos_set,
                 total_ejecta_mass=False, with_nsbh=False):
        """
        gw_samples : dict with chirp_mass, mass_ratio, lambda_tilde arrays
            (``with_nsbh=True``: chi_1, chi_2 instead of lambda_tilde)
        em_samples : dict with log10_mej_dyn, log10_mej_wind (or log10_mej)
        eos_set : TabulatedEOSSet (the conversion step)
        with_nsbh : NSBH spin variant (reference withNSBH,
            nmma/post_processing/resampling.py:56-71,120-157): the sampled
            space gains chi_1/chi_2 with KDE priors from the GW posterior,
            and the ejecta conversion takes the NSBH branch (selected
            automatically by radius_1 = 0 for the BH primary).
        """
        self.eos_set = eos_set
        self.with_nsbh = bool(with_nsbh)
        self.total_mode = total_ejecta_mass
        if total_ejecta_mass:
            self.em_kde = GaussianKDE(np.asarray(em_samples["log10_mej"]))
        else:
            self.em_kde = GaussianKDE(np.column_stack([
                em_samples["log10_mej_dyn"], em_samples["log10_mej_wind"]]))

        mc = np.asarray(gw_samples["chirp_mass"])
        q = np.asarray(gw_samples["mass_ratio"])
        priors = {
            "chirp_mass": Uniform(minimum=float(mc.min()),
                                  maximum=float(mc.max())),
            "mass_ratio": Uniform(minimum=0.5, maximum=1.0),
            "EOS": Uniform(minimum=0.0, maximum=float(eos_set.n_eos)),
            "alpha": Uniform(minimum=-1e-3, maximum=1e-3),
            "ratio_zeta": Uniform(minimum=0.0, maximum=1.0),
        }
        if self.with_nsbh:
            self.gw_kde = GaussianKDE(np.column_stack([mc, q]))
            chi1 = np.asarray(gw_samples["chi_1"])
            chi2 = np.asarray(gw_samples["chi_2"])
            self.chi1_kde = GaussianKDE(chi1)
            self.chi2_kde = GaussianKDE(chi2)
            priors["mass_ratio"] = Uniform(minimum=float(q.min()),
                                           maximum=float(q.max()))
            priors["chi_1"] = Uniform(minimum=float(chi1.min()),
                                      maximum=float(chi1.max()))
            priors["chi_2"] = Uniform(minimum=float(chi2.min()),
                                      maximum=float(chi2.max()))
        else:
            self.gw_kde = GaussianKDE(np.column_stack([
                mc, q, gw_samples["lambda_tilde"]]))
        self.priors = PriorDict(priors)

    def log_likelihood(self, params):
        p = dict(params)
        p = C.generate_mass_parameters(p)
        p["mass_1_source"] = p["mass_1"]
        p["mass_2_source"] = p["mass_2"]
        p = self.eos_set(p)
        p = C.KilonovaEjectaFitting()(p)
        if self.with_nsbh:
            logl = (self.gw_kde.logpdf(jnp.stack([
                jnp.asarray(p["chirp_mass"]),
                jnp.asarray(p["mass_ratio"])]))
                + self.chi1_kde.logpdf(jnp.asarray(p["chi_1"]))
                + self.chi2_kde.logpdf(jnp.asarray(p["chi_2"])))
        else:
            lam_t = C.lambda_1_lambda_2_to_lambda_tilde(
                p["lambda_1"], p["lambda_2"], p["mass_1"], p["mass_2"])
            logl = self.gw_kde.logpdf(jnp.stack([
                jnp.asarray(p["chirp_mass"]), jnp.asarray(p["mass_ratio"]),
                lam_t]))
        if self.total_mode:
            logl = logl + self.em_kde.logpdf(p["log10_mej"])
        else:
            logl = logl + self.em_kde.logpdf(jnp.stack([
                jnp.asarray(p["log10_mej_dyn"]),
                jnp.asarray(p["log10_mej_wind"])]))
        ok = jnp.isfinite(jnp.asarray(p["log10_mej_dyn"])) & \
            (jnp.asarray(p["log10_mej_dyn"]) > NEG_INF * 0.99)
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
