"""Golden-value tests for the analytic kilonova kernels.

The oracles are independent float64 NumPy implementations of the published
physics (Metzger 2017 shell model; Hotokezaka & Nakar 2020), written from
the equations — they validate the JAX kernels' math and f32 scaling.
"""

import numpy as np
import scipy.integrate

from nmma_tpu.constants import c_cgs, msun_cgs, sigSB
from nmma_tpu.models.kilonova import hona2020_mags, me2017_mags

DAY = 86400.0


def _barnes_eth(t_day):
    f = 2 * 0.17 * t_day**0.74
    return 0.36 * (np.exp(-0.56 * t_day) + np.log1p(f) / f)


def _korobkin_heat(t_sec, eth=0.5):
    arctan_term = 0.5 - np.arctan((t_sec - 1.3) / 0.11) / np.pi
    return 2.0 * 2e18 * eth * arctan_term**1.3


def _me2017_oracle(t_day, log10_mej, log10_vej, beta, log10_kappa_r, nu):
    """f64 shell-model oracle: returns (Ltot/1e40, R_photo, mags[F,T])."""
    mej = 10.0**log10_mej
    v0 = 10.0**log10_vej * c_cgs
    kr = 10.0**log10_kappa_r
    nshell = 300
    t = t_day * DAY

    m = np.geomspace(1e-8, mej, nshell)
    vm = np.minimum(v0 * (m / mej) ** (-1.0 / beta), c_cgs)
    xn0 = 0.8 * (2 / np.pi) * np.arctan(1e-8 / m)
    xr = 1.0 - xn0
    eth = _barnes_eth(t_day)

    dm = np.diff(m)
    ms, vs, xn0s, xrs = m[:-1], vm[:-1], xn0[:-1], xr[:-1]
    energy = np.zeros(nshell - 1)
    lums, rphs = [], []
    for j in range(len(t) - 1):
        dt = t[j + 1] - t[j]
        xn = xn0s * np.exp(-t[j] / 900.0)
        heat = 3.2e14 * xn + 2.1e10 * eth[j] * t_day[j] ** (-1.3)
        kap = 0.4 * (1 - xn - xrs) + kr * xrs
        t_d = 0.24 * kap * ms * msun_cgs / (vs * c_cgs * t[j] * beta)
        depth = ms * msun_cgs * kap / (4 * np.pi * (t[j] * vs) ** 2)
        spec_lum = energy / (t_d + t[j] * vs / c_cgs)
        lums.append((spec_lum * dm).sum() * msun_cgs / 1e40)
        rphs.append(vs[np.argmin(np.abs(depth - 1.0))] * t[j])
        energy = energy + dt * (heat - energy / t[j] - spec_lum)
    lums.append(0.0)
    rphs.append(0.0)
    ltot40, rph = np.array(lums), np.array(rphs)

    with np.errstate(divide="ignore", invalid="ignore"):
        temp = (ltot40 * 1e40 / (4 * np.pi * rph**2 * sigSB)) ** 0.25
    good = np.isfinite(temp)
    temp = np.interp(t_day, t_day[good], temp[good])
    with np.errstate(divide="ignore", over="ignore"):
        x = 6.62607015e-27 * nu[:, None] / (1.380649e-16 * temp[None, :])
        flux = (2 * 6.62607015e-27 / c_cgs**2 * nu[:, None] ** 3 / np.expm1(x)
                * rph[None, :] ** 2 / (10 * 3.085677581491367e18) ** 2)
        mags = np.where(flux > 0, -2.5 * np.log10(np.where(flux > 0, flux, 1)) - 48.6,
                        np.inf)
    return ltot40, rph, mags


def test_me2017_against_f64_oracle():
    t_day = np.geomspace(0.01, 14.0, 150)
    nu = np.array([6.2e14, 4.8e14, 3.9e14])  # ~g, ~r-ish, NIR
    params = dict(log10_mej=-1.5, log10_vej=-1.0, beta=3.0, log10_kappa_r=0.5)

    got = np.asarray(me2017_mags({k: np.float32(v) for k, v in params.items()},
                                 t_day.astype(np.float32), nu))
    _, _, want = _me2017_oracle(t_day, nu=nu, **params)

    # ignore the last (never-integrated) grid point and compare finite mags
    finite = np.isfinite(want[:, :-1]) & np.isfinite(got[:, :-1])
    assert finite.mean() > 0.8
    diff = np.abs(got[:, :-1] - want[:, :-1])[finite]
    assert diff.max() < 0.02, f"max mag deviation {diff.max()}"


def test_me2017_physical_shape():
    """Light curve peaks then decays; brighter for larger ejecta mass."""
    t_day = np.geomspace(0.05, 14.0, 150)
    nu = np.array([4.8e14])
    lo = me2017_mags(dict(log10_mej=-2.0, log10_vej=-1.0, beta=3.0,
                          log10_kappa_r=0.5), t_day, nu)
    hi = me2017_mags(dict(log10_mej=-1.0, log10_vej=-1.0, beta=3.0,
                          log10_kappa_r=0.5), t_day, nu)
    lo, hi = np.asarray(lo)[0], np.asarray(hi)[0]
    sel = np.isfinite(lo) & np.isfinite(hi)
    # more massive ejecta -> brighter around peak
    assert hi[sel][40:80].mean() < lo[sel][40:80].mean()


def _hona_oracle(t_day, params, nu):
    """f64 oracle with scipy solve_ivp for the shell-energy ODE."""
    t = t_day * DAY
    mej = 10.0 ** params["log10_mej"] * msun_cgs
    vmin, vmax = params["vej_min"], params["vej_max"]
    vmid = params["vej_frac"] * (vmax - vmin) + vmin
    vels = np.array([vmin, vmid, vmax])
    kappas = np.array([10.0 ** params["log10_kappa_low_vej"],
                       10.0 ** params["log10_kappa_high_vej"]])
    n = 4.5

    nsh = 100
    bes = vmax + vmin - np.geomspace(vmin, vmax, nsh)
    bes = bes[::-1][:-1]
    dbe = np.diff(np.append(bes, vmax))
    i = np.searchsorted(vels, bes)
    bej_p = (vels / vmin) ** (1 - n)
    bes_p = (bes / vmin) ** (1 - n)
    tau_acc = -np.cumsum((kappas * np.diff(bej_p))[::-1])[::-1]
    tau_acc = np.append(tau_acc, 0.0)
    taus = tau_acc[i] + kappas[i - 1] * (bes_p - bej_p[i])
    v0 = vmin * c_cgs
    rho0 = mej * (n - 3) / (4 * np.pi * v0**3) / (1 - (vmax / vmin) ** (3 - n))
    taus *= v0 * rho0 / (n - 1)
    dms = 4 * np.pi * v0**3 * rho0 * (bes / vmin) ** (2 - n) * dbe / vmin
    tds = taus * bes

    def lum(E, tt):
        tdif = tds / tt
        tesc = np.minimum(tt, tdif) + bes * tt
        ymax = np.sqrt(0.5 * tdif / tt)
        return scipy.special.erfc(ymax) * E / tesc

    def rhs(tt, E):
        return -E / tt - lum(E, tt) + dms * _korobkin_heat(tt)

    sol = scipy.integrate.solve_ivp(rhs, (t[0], t[-1]), np.zeros_like(bes),
                                    rtol=1e-8, atol=1.0, dense_output=True)
    ll = np.array([lum(sol.sol(tt), tt).sum() for tt in t])
    be_ph = np.exp(np.interp(2 * np.log(t), np.log(taus[::-1]),
                             np.log(bes[::-1])))
    rph = be_ph * t * c_cgs
    temp = (ll / (4 * np.pi * rph**2 * sigSB)) ** 0.25
    return ll, rph, temp


def test_hona2020_against_f64_oracle():
    import scipy.special  # noqa: F401
    t_day = np.geomspace(0.05, 14.0, 80)
    params = dict(log10_mej=-1.5, vej_min=0.05, vej_max=0.3, vej_frac=0.5,
                  log10_kappa_low_vej=0.0, log10_kappa_high_vej=0.7)
    nu = np.array([4.8e14])
    got = np.asarray(hona2020_mags(params, t_day, nu))[0]

    ll, rph, temp = _hona_oracle(t_day, params, nu)
    with np.errstate(over="ignore"):
        x = 6.62607015e-27 * nu[0] / (1.380649e-16 * temp)
        flux = (2 * 6.62607015e-27 / c_cgs**2 * nu[0] ** 3 / np.expm1(x)
                * rph**2 / (10 * 3.085677581491367e18) ** 2)
        want = -2.5 * np.log10(flux) - 48.6

    sel = np.isfinite(want) & np.isfinite(got) & (t_day > 0.1)
    assert sel.mean() > 0.7
    diff = np.abs(got - want)[sel]
    assert np.median(diff) < 0.01, f"median mag deviation {np.median(diff)}"
    assert diff.max() < 0.05, f"max mag deviation {diff.max()}"
