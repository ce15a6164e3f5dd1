"""TOV + tidal-Love-number integration as a fixed-grid jittable kernel.

TPU-native re-implementation of ``nmma/eos/tov.py``: the same ODE system in
the pseudo-enthalpy variable (r, m, H, beta), but integrated with RK4 on a
fixed log-spaced enthalpy grid instead of ``solve_ivp(rtol=1e-3)`` — a
static-shape program that vmaps over central pressures, so a whole
mass-radius-Lambda family is one XLA call (the reference loops TOVSolver
per central pressure, eos_gen.py:construct_family).

EOS input: tabulated log-log interpolators for e(h), p(h), de/dp(p), built
host-side by ``eos.EOSTable`` from a (number-density, energy-density,
pressure) micro table in nuclear units (MeV/fm^3), the reference's format.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# e (elementary charge) * 1e51: MeV/fm^3 -> SI, then G/c^4: SI -> geometric
_E_CHARGE = 1.602176634e-19
_G_SI = 6.674_30e-11
_C_SI = 299_792_458.0
particle_to_SI = _E_CHARGE * 1e51
SI_to_geometric = _G_SI / _C_SI**4
particle_to_geometric = particle_to_SI * SI_to_geometric

_N_STEPS = 400   # RK4 steps in pseudo-enthalpy (accuracy >> solve_ivp rtol=1e-3)


def calc_k2(r, m, big_h, b):
    """Tidal Love number k2 from surface values (reference tov.py:37-71)."""
    y = r * b / big_h
    c = m / r
    num = ((8.0 / 5.0) * jnp.power(1 - 2 * c, 2.0) * jnp.power(c, 5.0)
           * (2 * c * (y - 1) - y + 2))
    den = (2 * c * (4 * (y + 1) * c**4 + (6 * y - 4) * c**3
                    + (26 - 22 * y) * c * c + 3 * (5 * y - 8) * c
                    - 3 * y + 6))
    den = den - (3 * jnp.power(1 - 2 * c, 2) * (2 * c * (y - 1) - y + 2)
                 * jnp.log(1.0 / (1 - 2 * c)))
    return num / den


def _tov_rhs(h, y, eos):
    r, m, big_h, b = y
    e = eos.energy_density_from_pseudo_enthalpy(h) * particle_to_geometric
    p = eos.pressure_from_pseudo_enthalpy(h) * particle_to_geometric
    dedp = e / p * eos.log_dedp_from_log_pressure(
        jnp.log(p / particle_to_geometric))

    a = 1.0 / (1.0 - 2.0 * m / r)
    c1 = 2.0 / r + a * (2.0 * m / (r * r) + 4.0 * jnp.pi * r * (p - e))
    c0 = a * (-6.0 / (r * r) + 4.0 * jnp.pi * (e + p) * dedp
              + 4.0 * jnp.pi * (5.0 * e + 9.0 * p)) - jnp.power(
        2.0 * (m + 4.0 * jnp.pi * r**3 * p) / (r * (r - 2.0 * m)), 2.0)

    drdh = -r * (r - 2.0 * m) / (m + 4.0 * jnp.pi * r**3 * p)
    dmdh = 4.0 * jnp.pi * r * r * e * drdh
    dhdh = b * drdh
    dbdh = -(c0 * big_h + c1 * b) * drdh
    return jnp.stack([drdh, dmdh, dhdh, dbdh])


def tov_solve(eos, pc_pp):
    """(M [geom], R [geom], k2) for one central pressure [MeV/fm^3].

    Physics identical to ``TOVSolver`` (reference tov.py:74-109): series
    start just below the centre, integrate h -> 0, final Euler step to the
    surface. vmap over ``pc_pp`` for a family.
    """
    hc = eos.pseudo_enthalpy_from_pressure(pc_pp)
    ec = eos.energy_density_from_pressure(pc_pp) * particle_to_geometric
    pc = pc_pp * particle_to_geometric
    dedp_c = eos.dedp_from_pressure(pc_pp)
    dhdp_c = 1.0 / (ec + pc)
    dedh_c = dedp_c / dhdp_c

    dh = -1e-3 * hc
    h0 = hc + dh
    h1 = -dh
    r0 = jnp.sqrt(3.0 * (-dh) / (2.0 * jnp.pi * (ec + 3.0 * pc)))
    r0 = r0 * (1.0 - 0.25 * (ec - 3.0 * pc - 0.6 * dedh_c) * (-dh)
               / (ec + 3.0 * pc))
    m0 = 4.0 * jnp.pi * ec * r0**3 / 3.0 * (1.0 - 0.6 * dedh_c * (-dh) / ec)
    y0 = jnp.stack([r0, m0, r0 * r0, 2.0 * r0])

    # log-spaced grid from h0 down to h1 (resolves the steep surface region)
    frac = jnp.arange(_N_STEPS + 1) / _N_STEPS
    hs = h0 * jnp.power(h1 / h0, frac)

    def rk4(y, hh):
        h_a, h_b = hh
        step = h_b - h_a
        k1 = _tov_rhs(h_a, y, eos)
        k2_ = _tov_rhs(h_a + 0.5 * step, y + 0.5 * step * k1, eos)
        k3 = _tov_rhs(h_a + 0.5 * step, y + 0.5 * step * k2_, eos)
        k4 = _tov_rhs(h_b, y + step * k3, eos)
        return y + step / 6.0 * (k1 + 2 * k2_ + 2 * k3 + k4), None

    y_final, _ = jax.lax.scan(rk4, y0, (hs[:-1], hs[1:]))

    # final Euler step to the surface h=0 (reference :98-105)
    y_surface = y_final + _tov_rhs(h1, y_final, eos) * (0.0 - h1)
    r, m, big_h, b = y_surface
    return m, r, calc_k2(r, m, big_h, b)


def construct_family(eos, n_points=64, pc_min=None, pc_max=None):
    """(R [km], M [Msun], Lambda) curve over central pressures, vmapped.

    Counterpart of ``EOS_with_CSE.construct_family``
    (nmma/eos/eos_gen.py:construct_family): log-spaced central pressures up
    to the maximum tabulated pressure; the curve is truncated at the
    maximum mass by the caller (mask where M decreases).
    """
    if pc_min is None:
        # the reference starts the family at a FIXED 3.5 MeV/fm^3
        # (eos_gen.py construct_family): tying pc_min to the table's
        # minimum pressure (~1e-19 for crust tables) spreads the grid
        # over ~21 decades and leaves the NS branch nearly unresolved
        pc_min = max(3.5, float(eos.pressure_range[0]) * 1.01)
    if pc_max is None:
        pc_max = float(eos.pressure_range[1]) * 0.99
    pcs = jnp.geomspace(pc_min, pc_max, n_points)
    m_geom, r_geom, k2 = jax.vmap(lambda pc: tov_solve(eos, pc))(pcs)

    # geometric units are metres: M[Msun] = m/GMsun_c2, R[km] = r/1000
    msun_geom = _G_SI * 1.988409870698051e30 / _C_SI**2   # [m]
    masses = m_geom / msun_geom
    radii = r_geom * 1e-3
    compactness = m_geom / r_geom
    lambdas = 2.0 / 3.0 * k2 / jnp.power(compactness, 5.0)
    return radii, masses, lambdas, pcs
