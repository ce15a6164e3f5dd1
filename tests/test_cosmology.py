import numpy as np
from scipy.integrate import quad

from nmma_tpu.cosmology import PLANCK18, distance_modulus


def test_roundtrip_z_dl():
    z = np.array([0.001, 0.01, 0.05, 0.1, 0.5, 1.0, 2.0])
    dl = np.asarray(PLANCK18.luminosity_distance(z))
    z_back = np.asarray(PLANCK18.redshift_at_dl(dl))
    np.testing.assert_allclose(z_back, z, rtol=1e-4)


def test_luminosity_distance_vs_quadrature():
    """Independent check: adaptive quadrature of the same E(z) integrand."""
    def dl_quad(z):
        integral, _ = quad(lambda zz: PLANCK18._inv_efunc(np.array(zz)), 0.0, z,
                           epsrel=1e-10)
        return (1.0 + z) * PLANCK18.hubble_distance * integral

    for z in [0.009, 0.05, 0.2, 1.0, 3.0]:
        want = dl_quad(z)
        got = float(PLANCK18.luminosity_distance(z))
        np.testing.assert_allclose(got, want, rtol=5e-4)


def test_planck18_headline_values():
    # astropy Planck18: Ogamma0 ~ 5.4020e-5, Ode0 ~ 0.6889
    assert abs(PLANCK18.Ogamma0 - 5.402e-5) < 2e-7
    assert abs(PLANCK18.Ode0 - 0.6889) < 5e-4
    # low-z Hubble law: dL ~ cz/H0
    z = 0.005
    dl = float(PLANCK18.luminosity_distance(z))
    hubble = 299792.458 / 67.66 * z
    assert abs(dl / hubble - 1.0) < 0.01


def test_distance_modulus():
    assert abs(float(distance_modulus(1e-5)) - 0.0) < 1e-3  # 10 pc (f32)
    assert abs(float(distance_modulus(40.0)) - 33.0103) < 1e-3
