"""EOS tables: micro-physics interpolators + tabulated macro families.

TPU-native counterpart of ``nmma/eos/eos_processing.py`` (``EoSConverter``
modes 'tabulated'/... :235-332) and the table plumbing inside
``EOS_with_CSE`` (``nmma/eos/eos_gen.py``):

* ``EOSTable`` — log-log interpolators for a (n, e, p) micro table in
  MeV/fm^3 (the reference's eos_micro format), including the
  pseudo-enthalpy integral h(p) = int dp/(e+p); feeds the TOV kernel.
* ``TabulatedEOSSet`` — N macro curves (R, M, Lambda) resampled onto one
  static mass grid and stacked [N, M]; the sampled EOS index gathers a
  row, and lambda_1/2 + radius_1/2 at the source masses are pure interp —
  the jit-safe version of ``EoSConverter.system_props_from_eos``
  (:334-362) with the categorical EOS prior of ``eos_likelihood.py:21-32``.
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import geom_msun_km


class EOSTable:
    """Micro EOS (nuclear units, MeV/fm^3) with jittable interpolators.

    ``number_density`` [fm^-3], when given, is filtered/sorted alongside
    (e, p) and kept on ``self.number_density`` for n-based queries (the
    reference caps families at p(n_lim), eos_gen.py)."""

    def __init__(self, energy_density, pressure, number_density=None):
        e = np.asarray(energy_density, dtype=np.float64)
        p = np.asarray(pressure, dtype=np.float64)
        n = (np.asarray(number_density, dtype=np.float64)
             if number_density is not None else None)
        keep = (e > 0) & (p > 0)
        e, p = e[keep], p[keep]
        if n is not None:
            n = n[keep]
        order = np.argsort(p)
        e, p = e[order], p[order]
        self.number_density = n[order] if n is not None else None

        # pseudo-enthalpy h(p) = int dp'/(e + p'), LINEAR-in-p trapezoid.
        # Convention chosen by measurement against the reference's
        # shipped macro table (tests/test_eos.py): linear trapezoid
        # lands within 1.4% in mass, the reference code's own
        # cumtrapz(p/(e+p), log p) form (eos_gen.py:244-247) within
        # 2.2%, and a dense 20k-node exact integral within 6.4% — the
        # artifact was evidently generated with yet another low-density
        # treatment, so artifact parity (the measurable criterion)
        # picks the linear form.
        integrand = 1.0 / (e + p)
        h = np.concatenate([
            [p[0] * integrand[0]],
            p[0] * integrand[0] + np.cumsum(
                0.5 * (integrand[1:] + integrand[:-1]) * np.diff(p)),
        ])

        self.log_e = np.log(e)
        self.log_p = np.log(p)
        self.log_h = np.log(h)
        self.pressure_range = (float(p[0]), float(p[-1]))
        # d(log e)/d(log p) central differences for dedp
        dloge = np.gradient(self.log_e, self.log_p)
        self._dloge_dlogp = dloge

    # -- jittable interpolators (log-log linear) ---------------------------
    def energy_density_from_pressure(self, p):
        return jnp.exp(jnp.interp(jnp.log(p), self.log_p, self.log_e))

    def pseudo_enthalpy_from_pressure(self, p):
        return jnp.exp(jnp.interp(jnp.log(p), self.log_p, self.log_h))

    def pressure_from_pseudo_enthalpy(self, h):
        return jnp.exp(jnp.interp(jnp.log(h), self.log_h, self.log_p))

    def energy_density_from_pseudo_enthalpy(self, h):
        return jnp.exp(jnp.interp(jnp.log(h), self.log_h, self.log_e))

    def log_dedp_from_log_pressure(self, log_p):
        return jnp.interp(log_p, self.log_p, self._dloge_dlogp)

    def dedp_from_pressure(self, p):
        loge_over_logp = self.log_dedp_from_log_pressure(jnp.log(p))
        e = self.energy_density_from_pressure(p)
        return loge_over_logp * e / p

    @classmethod
    def from_file(cls, path):
        """Reference eos_micro format: density, e, p[, cs^2] columns."""
        arr = np.loadtxt(path)
        if arr.shape[1] >= 3:
            return cls(arr[:, 1], arr[:, 2], number_density=arr[:, 0])
        return cls(arr[:, 0], arr[:, 1])


_DEFAULT_MASS_GRID = np.linspace(0.5, 3.2, 256)


class TabulatedEOSSet:
    """Stacked macro EOS family with categorical-index conversion."""

    def __init__(self, radii_list, masses_list, lambdas_list,
                 mass_grid=_DEFAULT_MASS_GRID, weights=None):
        n = len(masses_list)
        self.mass_grid = np.asarray(mass_grid)
        m_grid = self.mass_grid
        rad = np.zeros((n, len(m_grid)))
        log_lam = np.full((n, len(m_grid)), -np.inf)
        tov_mass = np.zeros(n)
        tov_radius = np.zeros(n)
        r14 = np.zeros(n)
        r16 = np.zeros(n)
        for i, (r, m, lam) in enumerate(zip(radii_list, masses_list,
                                            lambdas_list)):
            r, m, lam = map(np.asarray, (r, m, lam))
            # truncate at maximum mass (stable branch)
            imax = int(np.argmax(m))
            r, m, lam = r[:imax + 1], m[:imax + 1], lam[:imax + 1]
            order = np.argsort(m)
            r, m, lam = r[order], m[order], lam[order]
            tov_mass[i] = m[-1]
            tov_radius[i] = r[-1]
            r14[i] = np.interp(1.4, m, r, left=0.0, right=0.0)
            r16[i] = np.interp(1.6, m, r, left=0.0, right=0.0)
            rad[i] = np.interp(m_grid, m, r, left=0.0, right=0.0)
            with np.errstate(divide="ignore"):
                ll = np.interp(m_grid, m, np.log(np.maximum(lam, 1e-300)),
                               left=-np.inf, right=-np.inf)
            log_lam[i] = ll
            # beyond MTOV the object is a BH: radius/lambda -> 0
            rad[i, m_grid > m[-1]] = 0.0
            log_lam[i, m_grid > m[-1]] = -np.inf

        self.radii = jnp.asarray(rad)
        self.log_lambdas = jnp.asarray(np.nan_to_num(log_lam, neginf=-745.0))
        self.tov_mass = jnp.asarray(tov_mass)
        self.tov_radius = jnp.asarray(tov_radius)
        self.r14 = jnp.asarray(r14)
        self.r16 = jnp.asarray(r16)
        self.n_eos = n
        self.weights = np.asarray(weights) if weights is not None else \
            np.ones(n) / n

    # -- conversion step (drop-in for the chain) ---------------------------
    def __call__(self, parameters):
        """Add EOS-derived parameters given a (possibly fractional) 'EOS'.

        The sampled 'EOS' parameter is continuous on [0, n_eos); the floor
        is the categorical index (reference WeightedCategorical sampling,
        eos_likelihood.py:21-32).
        """
        p = dict(parameters)
        idx = jnp.clip(jnp.floor(jnp.asarray(p["EOS"])).astype(jnp.int32),
                       0, self.n_eos - 1)
        p["EOS_index"] = idx
        rad_row = self.radii[idx]
        loglam_row = self.log_lambdas[idx]
        p["TOV_mass"] = self.tov_mass[idx]
        p["TOV_radius"] = self.tov_radius[idx]
        p["R_14"] = self.r14[idx]
        p["R_16"] = self.r16[idx]
        if "mass_1_source" in p:
            m1, m2 = p["mass_1_source"], p["mass_2_source"]
            grid = self.mass_grid
            p["radius_1"] = jnp.interp(m1, grid, rad_row, left=0.0, right=0.0)
            p["radius_2"] = jnp.interp(m2, grid, rad_row, left=0.0, right=0.0)
            lam1 = jnp.exp(jnp.interp(m1, grid, loglam_row,
                                      left=-745.0, right=-745.0))
            lam2 = jnp.exp(jnp.interp(m2, grid, loglam_row,
                                      left=-745.0, right=-745.0))
            p.setdefault("lambda_1", lam1)
            p.setdefault("lambda_2", lam2)
        return p


def load_macro_eos_set(path_or_files, mass_grid=_DEFAULT_MASS_GRID,
                       weights=None) -> TabulatedEOSSet:
    """Load reference-format macro files (R[km] M[Msun] Lambda [pc]).

    Accepts a directory (reads `*.dat`, numerically sorted — the
    reference's `EOS-to-RAM` mode, eos_processing.py:366-454), a glob, or
    an explicit file list.
    """
    if isinstance(path_or_files, (list, tuple)):
        files = list(path_or_files)
    elif os.path.isdir(path_or_files):
        files = glob.glob(os.path.join(path_or_files, "*.dat"))
        files.sort(key=lambda f: _numeric_key(os.path.basename(f)))
    else:
        files = sorted(glob.glob(path_or_files))
    from ..native import parse_many
    radii, masses, lambdas = [], [], []
    for arr in parse_many(files):
        radii.append(arr[:, 0])
        masses.append(arr[:, 1])
        # two-column (R, M) tables (the reference's sorted/ reweighting
        # output format) carry no tidal information
        lambdas.append(arr[:, 2] if arr.shape[1] > 2
                       else np.zeros(arr.shape[0]))
    return TabulatedEOSSet(radii, masses, lambdas, mass_grid=mass_grid,
                           weights=weights)


def _numeric_key(name):
    stem = os.path.splitext(name)[0]
    try:
        return (0, int(stem))
    except ValueError:
        return (1, stem)
