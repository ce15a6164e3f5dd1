"""EOS constraint likelihoods as pure jnp terms.

TPU-native counterpart of ``nmma/eos/eos_likelihood.py``: each constraint
is a callable ``(parameters, eos_curves) -> logL`` built from static arrays
(histograms, grids) prepared host-side at construction. ``JointEoSConstraint``
sums them — the whole EOS messenger is one fused expression inside the
joint jit.

Constraints implemented (reference :347-545):
  * LowerMTOVConstraint  — norm.logcdf(MTOV; m_obs, sigma)
  * UpperMTOVConstraint  — norm.logsf(MTOV; m_obs, sigma)
  * MassRadiusConstraint — smoothed 2-D histogram of an (R, M) posterior,
    summed along the EOS's M-R curve up to MTOV
  * JointEoSConstraint   — sum of the above
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import log_ndtr

try:
    from scipy.ndimage import gaussian_filter
except ImportError:  # pragma: no cover
    gaussian_filter = None


class LowerMTOVConstraint:
    """EOS must support at least m_obs (Gaussian; reference :392-409)."""

    def __init__(self, measured_mass, measure_error, name=None):
        self.mass = float(measured_mass)
        self.error = float(measure_error)
        self.name = name or "Lower MTOV"

    def __call__(self, parameters, curves=None):
        tov = jnp.asarray(parameters["TOV_mass"])
        return log_ndtr((tov - self.mass) / self.error)


class UpperMTOVConstraint:
    """EOS must support at most m_obs (Gaussian; reference :411-427)."""

    def __init__(self, measured_mass, measure_error, name=None):
        self.mass = float(measured_mass)
        self.error = float(measure_error)
        self.name = name or "Upper MTOV"

    def __call__(self, parameters, curves=None):
        tov = jnp.asarray(parameters["TOV_mass"])
        return log_ndtr(-(tov - self.mass) / self.error)


class MassRadiusConstraint:
    """2-D histogram mass-radius posterior constraint (reference :429-545).

    The histogram (smoothed with a sigma=3 Gaussian, identical binning
    rules) is built host-side; the likelihood walks the EOS's radius curve
    on a fixed test-mass grid, masks masses above MTOV, and log-sums the
    histogram values — all static-shape gathers.
    """

    def __init__(self, mass_array=None, radius_array=None, weights=None,
                 file_path=None, name=None, mass_step=0.01,
                 radius_step=0.03):
        if file_path:
            mass_array, radius_array, weights = self._read(file_path)
        masses = np.asarray(mass_array, dtype=np.float64)
        radii = np.asarray(radius_array, dtype=np.float64)
        self.name = name or "Mass-Radius"

        mass_bins = self._bins(masses, mass_step)
        rad_bins = self._bins(radii, radius_step)
        hist, self.rad_edges, self.mass_edges = np.histogram2d(
            radii, masses, bins=[rad_bins, mass_bins], weights=weights,
            density=True)
        drad = self.rad_edges[1] - self.rad_edges[0]
        dmass = self.mass_edges[1] - self.mass_edges[0]
        hist = hist * dmass * drad
        if gaussian_filter is not None:
            hist = gaussian_filter(hist, sigma=3)
        self.histogram = jnp.asarray(hist)
        self.test_masses = jnp.linspace(1.2, 2.5, 151)

    @staticmethod
    def _read(file_path):
        data = np.loadtxt(file_path, unpack=True)
        if data.shape[0] not in (2, 3):
            data = data.T
        weights = None
        if data.shape[0] == 3:
            a, b, weights = data
        else:
            a, b = data
        if (a <= 3.0).any():
            masses, radius = a, b
        else:
            radius, masses = a, b
        return masses, radius, weights

    @staticmethod
    def _bins(array, step, sensitivity=0.001):
        low, high = np.quantile(array, [sensitivity, 1.0 - sensitivity])
        return np.arange(0.95 * low, 1.05 * high, step, dtype=np.float64)

    def __call__(self, parameters, curves):
        """curves: dict with 'masses' [M] and 'radii' [M] (mass-sorted)."""
        tov = jnp.asarray(parameters["TOV_mass"])
        masses, radii = jnp.asarray(curves["masses"]), \
            jnp.asarray(curves["radii"])
        # beyond-MTOV rows carry 0.0 radii (TabulatedEOSSet padding):
        # forward-fill them with the last physical radius so the
        # interpolation in the bin just below MTOV is not pulled toward
        # 0 km (the reference interpolates the truncated curve with
        # flat-right extrapolation, eos_likelihood.py single_logl)
        idx = jnp.arange(radii.shape[0])
        last_good = jax.lax.cummax(jnp.where(radii > 0.0, idx, 0))
        radii_ff = radii[last_good]
        test_radii = jnp.interp(self.test_masses, masses, radii_ff)
        below_tov = self.test_masses < tov
        # outside the histogram's support -> zero probability, not the
        # nearest edge bin's density
        in_support = ((test_radii >= self.rad_edges[0])
                      & (test_radii <= self.rad_edges[-1])
                      & (self.test_masses >= self.mass_edges[0])
                      & (self.test_masses <= self.mass_edges[-1]))

        yi = jnp.clip(
            jnp.sum(self.test_masses[:, None] > self.mass_edges[1:][None, :],
                    axis=1), 0, self.histogram.shape[1] - 1)
        xi = jnp.clip(
            jnp.sum(test_radii[:, None] > self.rad_edges[1:][None, :],
                    axis=1), 0, self.histogram.shape[0] - 1)
        vals = self.histogram[xi, yi]
        total = jnp.sum(jnp.where(below_tov & in_support, vals, 0.0))
        return jnp.log(jnp.maximum(total, 1e-300))


class JointEoSConstraint:
    """Sum of constraint terms (reference ``JointEoSConstraint`` :57-65)."""

    def __init__(self, *constraints):
        self.constraints = list(constraints)

    def __call__(self, parameters, curves=None):
        total = jnp.asarray(0.0)
        for c in self.constraints:
            total = total + c(parameters, curves)
        return total


def tabulate_weighted_eos(eos_set, constraint, outdir, previous_weights=None,
                          normalise=True):
    """Re-weight and sort a macro EOS family under constraints.

    Counterpart of ``tabulate_weighted_eos``
    (nmma/eos/eos_likelihood.py:262-326): the reference evaluates the
    constraint per EOS with a process pool; here the whole family's
    curves are scored in one vmapped/jitted call on the device. Output
    layout matches the reference: ``outdir/sorted/<i>.dat`` (R, M
    columns, ascending weight order) + ``outdir/eos_weights.dat``.

    Returns (weight_path, sorted_dir, n_eos, weights ascending).
    """
    import os

    import jax

    m_grid = jnp.asarray(eos_set.mass_grid)

    def score(i):
        curves = {"masses": m_grid, "radii": eos_set.radii[i]}
        params = {"TOV_mass": eos_set.tov_mass[i]}
        return constraint(params, curves)

    n = len(eos_set.tov_mass)
    log_w = np.asarray(jax.jit(jax.vmap(score))(jnp.arange(n)),
                       dtype=np.float64)
    good = np.isfinite(log_w)
    log_w = log_w[good]
    idx_good = np.flatnonzero(good)

    if previous_weights is not None:
        prev = np.asarray(previous_weights, dtype=np.float64)[good]
        log_w = log_w + np.log(np.maximum(prev, 1e-300))
    if normalise:
        from scipy.special import logsumexp
        log_w = log_w - logsumexp(log_w)
    weights = np.exp(log_w)

    sorted_dir = os.path.join(outdir, "sorted")
    os.makedirs(sorted_dir, exist_ok=True)
    order = np.argsort(weights)
    for rank, j in enumerate(order):
        i = idx_good[j]
        m = np.asarray(eos_set.mass_grid)
        r = np.asarray(eos_set.radii[i])
        lam = np.exp(np.asarray(eos_set.log_lambdas[i]))
        keep = r > 0
        np.savetxt(os.path.join(sorted_dir, f"{rank + 1}.dat"),
                   np.column_stack([r[keep], m[keep], lam[keep]]))
    weight_path = os.path.join(outdir, "eos_weights.dat")
    np.savetxt(weight_path, weights[order])
    return weight_path, sorted_dir, int(good.sum()), weights[order]
