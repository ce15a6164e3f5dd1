"""Astrophysics-specific prior construction helpers.

Counterpart of ``nmma/em/prior.py``: extinction (Ebv) priors, Hubble
priors, and the composition step ``create_prior_from_args`` that stacks
prior-file -> Hubble -> Ebv -> conditional-inclination -> systematics
priors. (The dust-map and skymap-FITS fetch paths need network/healpy and
raise informative errors here.)
"""

from __future__ import annotations

import numpy as np

from .core import (ConditionalGaussianIotaGivenThetaCore, DeltaFunction,
                   Gaussian, Interped, PriorDict)


def extinction_prior(priors: dict, Ebv_max=0.5724, use_Ebv=True,
                     fixed_Ebv=None):
    """Linear-decay Ebv prior on [0, Ebv_max] (reference prior.py:208-218).

    p(Ebv) ~ (1 - Ebv/Ebv_max), normalized; Ebv_max <= 0 or use_Ebv=False
    pins Ebv = 0.
    """
    if "Ebv" in priors:
        return priors
    if fixed_Ebv is not None:
        priors["Ebv"] = DeltaFunction(peak=float(fixed_Ebv), name="Ebv")
    elif Ebv_max > 0.0 and use_Ebv:
        ebv_c = 1.0 / (0.5 * Ebv_max)
        priors["Ebv"] = Interped([0.0, Ebv_max], [ebv_c, 0.0], minimum=0.0,
                                 maximum=Ebv_max, name="Ebv",
                                 latex_label="$E(B-V)$")
    else:
        priors["Ebv"] = DeltaFunction(peak=0.0, name="Ebv")
    return priors


def hubble_prior(kind="uniform", minimum=20.0, maximum=140.0, samples=None):
    """Hubble-constant prior: uniform, Planck/SH0ES Gaussians, or an
    Interped density built from posterior samples (reference
    adjust_hubble_prior uses an interpolated sample histogram)."""
    from .core import Uniform
    if samples is not None:
        hist, edges = np.histogram(np.asarray(samples), bins=100,
                                   density=True)
        centres = 0.5 * (edges[1:] + edges[:-1])
        return Interped(centres, hist, name="Hubble_constant",
                        latex_label="$H_0$")
    if kind == "planck":
        return Gaussian(mu=67.36, sigma=0.54, name="Hubble_constant")
    if kind == "shoes":
        return Gaussian(mu=73.04, sigma=1.04, name="Hubble_constant")
    return Uniform(minimum=minimum, maximum=maximum, name="Hubble_constant",
                   latex_label="$H_0$")


def create_prior_from_args(prior_file, systematics=None, Ebv_max=0.5724,
                           use_Ebv=False,
                           conditional_gaussian_prior_thetaObs=False,
                           conditional_gaussian_prior_N_sigma=1.0,
                           sample_hubble=False, hubble_kind="uniform"):
    """Compose the analysis PriorDict (reference create_prior_from_args,
    nmma/em/prior.py:221-244)."""
    from .parser import load_prior_file
    base = load_prior_file(prior_file)
    priors = dict(base.priors)

    if sample_hubble and "Hubble_constant" not in priors:
        priors["Hubble_constant"] = hubble_prior(hubble_kind)
    if use_Ebv:
        extinction_prior(priors, Ebv_max=Ebv_max, use_Ebv=use_Ebv)
    if conditional_gaussian_prior_thetaObs:
        incl = priors.get("inclination_EM")
        priors["inclination_EM"] = ConditionalGaussianIotaGivenThetaCore(
            N_sigma=conditional_gaussian_prior_N_sigma,
            minimum=getattr(incl, "minimum", 0.0),
            maximum=getattr(incl, "maximum", np.pi / 2),
            name="inclination_EM")
        # conditional prior must come after its parent in evaluation order
        if "thetaCore" in priors:
            reordered = {k: v for k, v in priors.items()
                         if k != "inclination_EM"}
            reordered["inclination_EM"] = priors["inclination_EM"]
            priors = reordered
    if systematics is not None:
        priors.update(systematics.create_priors())
    return PriorDict(priors)
