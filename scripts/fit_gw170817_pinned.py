"""Pinned-geometry GW170817 afterglow fit (VERDICT r3 next #1 criterion b).

Fits the TrPi2018 kernel to the reference's shipped GRB170817A
radio/X-ray compilation with inclination and thetaCore PINNED to the
VLBI-constrained values (Mooley et al. 2018; Ghirlanda et al. 2019:
theta_v ~= 0.35-0.40 rad, theta_c ~= 0.07), freeing only the
degenerate microphysics (E0, n0, p, eps_e, eps_B). A good chi2/dof
here proves residuals at published posterior medians are parameter
degeneracy, not a kernel normalization defect.

``--geom vlbi-range`` additionally floats the geometry INSIDE the VLBI
1-sigma boxes (theta_v in [0.32, 0.43], theta_c in [0.05, 0.09]) —
still VLBI-constrained, just not point-pinned.

chi2 is reported under three error models: raw (floor 0.05 mag),
syst 0.1 and syst 0.2 mag added in quadrature — the reference's EM
likelihood samples exactly such a systematic (em_syst_err), and the
Makhathini et al. (2021) compilation carries known inter-epoch
calibration scatter (e.g. the 6 GHz 149.3 d point is as bright as
3 GHz at 163 d, impossible on the observed nu^-0.58 spectrum).

Usage: python scripts/fit_gw170817_pinned.py [--geom pinned|vlbi-range]
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRIGGER = 57982.5285236896
DATA = ("/root/reference/example_files/lightcurves/"
        "AT2017gfo_GRB170817A_corrected.dat")
BANDS = {"radio-3GHz": 3.0e9, "radio-6GHz": 6.0e9,
         "X-ray-1keV": 2.417989e17}
# VLBI-pinned geometry
THETA_V = 0.40
THETA_C = 0.066
THETA_W = 0.47


def load_points():
    from nmma_tpu.io import load_em_observations
    data = load_em_observations(DATA)
    rows = []
    for band, nu in BANDS.items():
        sub = data[band]
        tt = np.asarray(sub["time"]) - TRIGGER
        sel = (tt > 8.0) & (tt < 750.0)
        rows.append((band, nu, tt[sel], np.asarray(sub["mag"])[sel],
                     np.asarray(sub["mag_error"])[sel]))
    return rows


def make_objective(rows, geom="pinned", syst=0.0):
    import jax
    import jax.numpy as jnp

    from nmma_tpu.models.grb import grb_afterglow_flux_density

    nus = np.array([nu for _, nu, *_ in rows])
    # one shared geomspace grid, interpolated per band
    t_grid = np.geomspace(8.0, 760.0, 64)

    @jax.jit
    def model_mags(x):
        tv = x[5] if geom == "vlbi-range" else THETA_V
        tc = x[6] if geom == "vlbi-range" else THETA_C
        p = dict(log10_E0=x[0], log10_n0=x[1], p=x[2],
                 log10_epsilon_e=x[3], log10_epsilon_B=x[4],
                 thetaCore=tc, thetaWing=THETA_W,
                 inclination_EM=tv, xi_N=1.0, d_L=1.2344e26)
        f = grb_afterglow_flux_density(t_grid, nus, p)
        return -2.5 * jnp.log10(jnp.maximum(f, 1e-30)) + 16.4  # mJy->AB

    def chi2(x, syst_mag=syst):
        mg = np.asarray(model_mags(jnp.asarray(x, dtype=np.float32)))
        tot, per = 0.0, {}
        for i, (band, nu, tt, mm, ee) in enumerate(rows):
            mod = np.interp(np.log(tt), np.log(t_grid), mg[i])
            sig = np.sqrt(np.maximum(ee, 0.05) ** 2 + syst_mag**2)
            c = float(np.sum(((mod - mm) / sig) ** 2))
            per[band] = c / len(tt)
            tot += c
        return tot, per

    return chi2


def fit(geom="pinned", verbose=True):
    from scipy.optimize import minimize
    rows = load_points()
    ndof = sum(len(r[2]) for r in rows)
    chi2 = make_objective(rows, geom)

    x0 = np.array([52.6, -2.5, 2.17, -1.5, -3.5])
    bounds = [(49.5, 54.5), (-6.0, 0.5), (2.02, 2.6),
              (-4.0, -0.2), (-6.5, -0.5)]
    names = ["log10_E0", "log10_n0", "p", "log10_epsilon_e",
             "log10_epsilon_B"]
    if geom == "vlbi-range":
        x0 = np.concatenate([x0, [0.40, 0.066]])
        bounds += [(0.32, 0.43), (0.05, 0.09)]
        names += ["inclination_EM", "thetaCore"]

    lo = np.array([b[0] for b in bounds])
    hi = np.array([b[1] for b in bounds])

    def f(x):
        return chi2(np.clip(x, lo, hi))[0]

    best = None
    for seed_p in (2.17, 2.1, 2.3):
        x0[2] = seed_p
        r = minimize(f, x0, method="Nelder-Mead",
                     options=dict(maxiter=1200, xatol=1e-3, fatol=1e-3))
        if best is None or r.fun < best.fun:
            best = r
    xb = np.clip(best.x, lo, hi)
    out = {"geom": geom, "ndof": ndof,
           "x": {k: round(float(v), 3) for k, v in zip(names, xb)}}
    for syst in (0.0, 0.1, 0.2):
        tot, per = chi2(xb, syst_mag=syst)
        out[f"syst{syst}"] = {
            "chi2_dof": round(tot / ndof, 2),
            "per_band": {k: round(v, 2) for k, v in per.items()}}
    if verbose:
        print(json.dumps(out))
    return out


if __name__ == "__main__":
    geom = sys.argv[sys.argv.index("--geom") + 1] \
        if "--geom" in sys.argv else "pinned"
    if geom == "all":
        fit("pinned")
        fit("vlbi-range")
    else:
        fit(geom)
