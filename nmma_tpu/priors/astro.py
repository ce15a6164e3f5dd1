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


def inclination_prior_from_fits(fits_file, dL, ra=None, dec=None,
                                cosiota_node_num=10, n_grid=1000):
    """Interped inclination_EM prior from a BAYESTAR-style skymap FITS.

    Counterpart of ``inclination_prior_from_fits``
    (nmma/em/prior.py:80-171), healpy/ligo.skymap-free: the multi-order
    skymap's per-pixel cos-iota-conditional distance layers
    (PROBDENSITY/DISTMU/DISTSIGMA/DISTNORM *_SAMPLES columns) are read
    with the pure-numpy FITS reader, the pixel is located with the
    native nested-HEALPix index, and

        p(u) = probdensity(u) * distnorm(u) * dL^2 * N(dL; mu(u), sigma(u))
        p(iota) = p(cos iota) |sin iota|,  folded onto [0, pi/2]

    becomes an ``Interped`` prior. ra/dec in degrees; None -> the
    maximum-probability pixel.
    """
    from scipy.interpolate import PchipInterpolator
    from scipy.stats import norm

    from ..io.fits import read_bintable, skymap_pixel_index, uniq2nest
    from .core import Interped

    cols, _ = read_bintable(fits_file)
    if "PROBDENSITY" in cols:                # scalar column (prior.py:86)
        map_idx = int(np.argmax(cols["PROBDENSITY"]))
    else:
        map_idx = int(np.argmax(
            np.atleast_2d(cols["PROBDENSITY_SAMPLES"]).mean(axis=1)))

    if ra is not None and dec is not None and "UNIQ" in cols:
        orders, nests = uniq2nest(cols["UNIQ"])
        order = int(orders[map_idx])
        target = skymap_pixel_index(ra, dec, 2 ** order)
        nest_idxs = np.where(orders == order, nests, 0)
        row = int(np.argmin(np.abs(nest_idxs - target)))
    else:
        row = map_idx

    nodes = np.cos(np.linspace(0.0, np.pi, int(cosiota_node_num)))[::-1]
    interp = {}
    for name in ("PROBDENSITY", "DISTMU", "DISTSIGMA", "DISTNORM"):
        samples = np.atleast_2d(cols[f"{name}_SAMPLES"])[row][::-1]
        interp[name] = PchipInterpolator(nodes, samples)

    u = np.linspace(-1.0, 1.0, n_grid)
    prob_u = (interp["PROBDENSITY"](u) * interp["DISTNORM"](u) * dL**2
              * norm(interp["DISTMU"](u), interp["DISTSIGMA"](u)).pdf(dL))
    iota = np.arccos(u)                       # descending pi -> 0
    prob_iota = prob_u * np.abs(np.sin(iota))

    # fold [pi/2, pi] onto [0, pi/2] (EM can't tell iota from pi - iota)
    lt = iota < np.pi / 2
    iota_em = iota[lt]
    prob_em = prob_iota[lt] + prob_iota[~lt][::-1]
    order_ix = np.argsort(iota_em)
    return Interped(iota_em[order_ix], prob_em[order_ix], minimum=0.0,
                    maximum=np.pi / 2, name="inclination_EM")


def h5_to_multivar_prior(h5_file_path, priors=None):
    """Fit a multivariate Gaussian to the sample columns of an HDF5 file
    and add the correlated prior block (reference ``h5_to_multivar_prior``,
    nmma/core/base.py:257-272: every top-level dataset is one parameter's
    samples)."""
    import h5py

    from .core import multivariate_gaussian_priors
    priors = dict(priors or {})
    with h5py.File(h5_file_path, "r") as f:
        keys = list(f.keys())
        samples = np.column_stack([np.asarray(f[k]) for k in keys])
    priors.update(multivariate_gaussian_priors(keys, samples=samples))
    return priors


def adjust_priors_for_nmma(priors):
    """Replace NMMADummyPrior placeholders (reference
    ``adjust_priors_for_nmma``, nmma/core/base.py:198-231): '*h5*' keys
    load a multivariate-Gaussian block, '*hubble*' keys an Interped
    prior from a two-column Hubble weight table. Returns a PriorDict."""
    from .core import NMMADummyPrior, PriorDict
    pd = dict(priors.priors) if isinstance(priors, PriorDict) else \
        dict(priors)
    for key in list(pd):
        prior = pd[key]
        if not isinstance(prior, NMMADummyPrior):
            continue
        setup = prior.setup_props
        pd.pop(key)
        if "h5" in key.lower():
            pd = h5_to_multivar_prior(setup, pd)
        elif "hubble" in key.lower():
            table = np.loadtxt(setup)
            if table.ndim != 2:
                raise ValueError(f"bad Hubble weight table {setup}")
            xx, yy = table[:, 0], table[:, 1]
            pd["Hubble_constant"] = Interped(
                xx, yy, name="Hubble_constant")
        else:
            raise ValueError(
                f"NMMADummyPrior key {key!r} matches no replacement rule "
                "(expected 'h5' or 'hubble' in the name)")
    return PriorDict(pd)
