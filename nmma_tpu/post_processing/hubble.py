"""Hubble-constant estimation from EM/GW distance posteriors.

Counterpart of ``gwem-Hubble-estimate``
(``nmma/post_processing/hubble_estimates.py:14-169``): per-event H0
posteriors from luminosity-distance posteriors at known redshift, KDE
combination across events, and an H0^3 volume selection correction.

At fixed z and fixed other cosmological parameters, d_L is proportional to
1/H0, so each distance sample maps to H0 = H0_fid * d_L^fid(z) / d_L.
"""

from __future__ import annotations

import numpy as np

from ..cosmology import get_cosmology
from .kde import GaussianKDE


def hubble_posterior_from_distance_samples(distance_samples, redshift,
                                           cosmology=None):
    """H0 samples [km/s/Mpc] from d_L posterior samples at known z."""
    cosmo = cosmology or get_cosmology()
    d_fid = float(np.asarray(cosmo.luminosity_distance(redshift)))
    return cosmo.H0 * d_fid / np.asarray(distance_samples)


def combine_hubble_posteriors(event_h0_samples, h0_grid=None,
                              selection_correction=True):
    """Product of per-event H0 KDEs on a grid, optional H0^3 correction.

    Returns (h0_grid, combined_pdf, (median, lower68, upper68)).
    Reference: cumulative KDE product + selection effect + HDI
    (hubble_estimates.py:76-169).
    """
    if h0_grid is None:
        h0_grid = np.linspace(20.0, 140.0, 601)
    log_pdf = np.zeros_like(h0_grid)
    for samples in event_h0_samples:
        kde = GaussianKDE(np.asarray(samples))
        log_pdf += np.asarray([float(kde.logpdf(h)) for h in h0_grid])
    if selection_correction:
        # observable volume scales as d^3 ~ H0^-3: divide it out
        log_pdf += 3.0 * np.log(h0_grid)
    log_pdf -= log_pdf.max()
    pdf = np.exp(log_pdf)
    pdf /= np.trapezoid(pdf, h0_grid)

    cdf = np.concatenate([[0.0], np.cumsum(
        0.5 * (pdf[1:] + pdf[:-1]) * np.diff(h0_grid))])
    cdf /= cdf[-1]
    median = np.interp(0.5, cdf, h0_grid)
    lo = np.interp(0.16, cdf, h0_grid)
    hi = np.interp(0.84, cdf, h0_grid)
    return h0_grid, pdf, (median, lo, hi)
