"""Second-source verification of the IMRPhenomD coefficient tables.

VERDICT round-2 "What's weak" #4: the 659-line transcription in
``nmma_tpu/gw/phenomd.py`` was validated only against itself; a single
mistyped digit in the merger-ringdown regime would pass every test.

This module re-transcribes every phenomenological fit **in a different
source layout** — the per-coefficient polynomial *functions* of
LALSimIMRPhenomD_internals.c (the form LAL publishes; Khan et al., PRD 93,
044007 (2016) Table V, and Husa et al., PRD 93, 044006 (2016) eqs. 3.6-3.8)
— and diffs them against the package's table across the full calibration
grid. The two transcriptions share no code: the package stores an 11-tuple
per name consumed by ``_fit``; here each fit is written out as LAL writes
it (xi-grouped trinomials inline). A transcription error injected into any
single constant on either side fails the grid diff at rtol=1e-12.

Also pins the 3.5PN TaylorF2 phasing coefficients against independently
computed published values (Buonanno et al. 2009 eq. 3.18 / LAL
XLALSimInspiralPNPhasing_F2), closing the round-2 ADVICE 'high' finding
(the 3PN ln4 constant was a factor 3 too small).
"""

import numpy as np
import pytest

from nmma_tpu.gw.phenomd import (_COEFFS, _fit, _tf2_phasing, final_spin,
                                 radiated_energy)

# ---------------------------------------------------------------------------
# LAL-form second transcription (LALSimIMRPhenomD_internals.c).
# Each function: (eta, xi) -> fit value, with xi = chiPN - 1.
# Constants written in LAL's own ordering and grouping, NOT the package's.
# ---------------------------------------------------------------------------


def rho1_fun(eta, xi):
    eta2 = eta * eta
    return (3931.8979897196696 - 17395.758706812805 * eta
            + (3132.375545898835 + 343965.86092361377 * eta
               - 1.2162565819981997e6 * eta2) * xi
            + (-70698.00600428853 + 1.383907177859705e6 * eta
               - 3.9662761890979446e6 * eta2) * xi * xi
            + (-60017.52423652596 + 803515.1181825735 * eta
               - 2.091710365941658e6 * eta2) * xi * xi * xi)


def rho2_fun(eta, xi):
    eta2 = eta * eta
    return (-40105.47653771657 + 112253.0169706701 * eta
            + (23561.696065836168 - 3.476180699403351e6 * eta
               + 1.137593670849482e7 * eta2) * xi
            + (754313.1127166454 - 1.308476044625268e7 * eta
               + 3.6444584853928134e7 * eta2) * xi * xi
            + (596226.612472288 - 7.4277901143564405e6 * eta
               + 1.8928977514040343e7 * eta2) * xi * xi * xi)


def rho3_fun(eta, xi):
    eta2 = eta * eta
    return (83208.35471266537 - 191237.7264145924 * eta
            + (-210916.2454782992 + 8.71797508352568e6 * eta
               - 2.6914942420669552e7 * eta2) * xi
            + (-1.9889806527362722e6 + 3.0888029960154563e7 * eta
               - 8.390870279256162e7 * eta2) * xi * xi
            + (-1.4535031953446497e6 + 1.7063528990822166e7 * eta
               - 4.2748659731120914e7 * eta2) * xi * xi * xi)


def v2_fun(eta, xi):
    eta2 = eta * eta
    return (0.8149838730507785 + 2.5747553517454658 * eta
            + (1.1610198035496786 - 2.3627771785551537 * eta
               + 6.771038707057573 * eta2) * xi
            + (0.7570782938606834 - 2.7256896890432474 * eta
               + 7.1140380397149965 * eta2) * xi * xi
            + (0.1766934149293479 - 0.7978690983168183 * eta
               + 2.1162391502005153 * eta2) * xi * xi * xi)


def gamma1_fun(eta, xi):
    eta2 = eta * eta
    return (0.006927402739328343 + 0.03020474290328911 * eta
            + (0.006308024337706171 - 0.12074130661131138 * eta
               + 0.26271598905781324 * eta2) * xi
            + (0.0034151773647198794 - 0.10779338611188374 * eta
               + 0.27098966966891747 * eta2) * xi * xi
            + (0.0007374185938559283 - 0.02749621038376281 * eta
               + 0.0733150789135702 * eta2) * xi * xi * xi)


def gamma2_fun(eta, xi):
    eta2 = eta * eta
    return (1.010344404799477 + 0.0008993122007234548 * eta
            + (0.283949116804459 - 4.049752962958005 * eta
               + 13.207828172665366 * eta2) * xi
            + (0.10396278486805426 - 7.025059158961947 * eta
               + 24.784892370130475 * eta2) * xi * xi
            + (0.03093202475605892 - 2.6924023896851663 * eta
               + 9.609374464684983 * eta2) * xi * xi * xi)


def gamma3_fun(eta, xi):
    eta2 = eta * eta
    return (1.3081615607036106 - 0.005537729694807678 * eta
            + (-0.06782917938621007 - 0.6689834970767117 * eta
               + 3.403147966134083 * eta2) * xi
            + (-0.05296577374411866 - 0.9923793203111362 * eta
               + 4.820681208409587 * eta2) * xi * xi
            + (-0.006134139870393713 - 0.38429253308696365 * eta
               + 1.7561754421985984 * eta2) * xi * xi * xi)


def sigma1_fun(eta, xi):
    eta2 = eta * eta
    return (2096.551999295543 + 1463.7493168261553 * eta
            + (1312.5493286098522 + 18307.330017082117 * eta
               - 43534.1440746107 * eta2) * xi
            + (-833.2889543511114 + 32047.31997183187 * eta
               - 108609.45037520859 * eta2) * xi * xi
            + (452.25136398112204 + 8353.439546391714 * eta
               - 44531.3250037322 * eta2) * xi * xi * xi)


def sigma2_fun(eta, xi):
    eta2 = eta * eta
    return (-10114.056472621156 - 44631.01109458185 * eta
            + (-6541.308761668722 - 266959.23419307504 * eta
               + 686328.3229317984 * eta2) * xi
            + (3405.6372187679685 - 437507.7208209015 * eta
               + 1.6318171307344697e6 * eta2) * xi * xi
            + (-7462.648563007646 - 114585.25177153319 * eta
               + 674402.4689098676 * eta2) * xi * xi * xi)


def sigma3_fun(eta, xi):
    eta2 = eta * eta
    return (22933.658273436497 + 230960.00814979506 * eta
            + (14961.083974183695 + 1.1940181342318142e6 * eta
               - 3.1042239693052764e6 * eta2) * xi
            + (-3038.166617199259 + 1.8720322849093592e6 * eta
               - 7.309145012085539e6 * eta2) * xi * xi
            + (42738.22871475411 + 467502.018616601 * eta
               - 3.064853498512499e6 * eta2) * xi * xi * xi)


def sigma4_fun(eta, xi):
    eta2 = eta * eta
    return (-14621.71522218357 - 377812.8579387104 * eta
            + (-9608.682631509726 - 1.7108925257214056e6 * eta
               + 4.332924601416521e6 * eta2) * xi
            + (-22366.683262266528 - 2.5019716386377467e6 * eta
               + 1.0274495902259542e7 * eta2) * xi * xi
            + (-85360.30079034246 - 570025.3441737515 * eta
               + 4.396844346849777e6 * eta2) * xi * xi * xi)


def beta1_fun(eta, xi):
    eta2 = eta * eta
    return (97.89747327985583 - 42.659730877489224 * eta
            + (153.48421037904913 - 1417.0620760768954 * eta
               + 2752.8614143665027 * eta2) * xi
            + (138.7406469558649 - 1433.6585075135881 * eta
               + 2857.7418952430758 * eta2) * xi * xi
            + (41.025109467376126 - 423.680737974639 * eta
               + 850.3594335657173 * eta2) * xi * xi * xi)


def beta2_fun(eta, xi):
    eta2 = eta * eta
    return (-3.282701958759534 - 9.051384468245866 * eta
            + (-12.415449742258042 + 55.4716447709787 * eta
               - 106.05109938966335 * eta2) * xi
            + (-11.953044553690658 + 76.80704618365418 * eta
               - 155.33172948098394 * eta2) * xi * xi
            + (-3.4129261592393263 + 25.572377569952536 * eta
               - 54.408036707740465 * eta2) * xi * xi * xi)


def beta3_fun(eta, xi):
    eta2 = eta * eta
    return (-0.000025156429818799565 + 0.000019750256942201327 * eta
            + (-0.000018370671469295915 + 0.000021886317041311973 * eta
               + 0.00008250240316860033 * eta2) * xi
            + (7.157371250566708e-6 - 0.000055780000112270685 * eta
               + 0.00019142082884072178 * eta2) * xi * xi
            + (5.447166261464217e-6 - 0.00003220610095021982 * eta
               + 0.00007974016714984341 * eta2) * xi * xi * xi)


def alpha1_fun(eta, xi):
    eta2 = eta * eta
    return (43.31514709695348 + 638.6332679188081 * eta
            + (-32.85768747216059 + 2415.8938269370315 * eta
               - 5766.875169379177 * eta2) * xi
            + (-61.85459307173841 + 2953.967762459948 * eta
               - 8986.29057591497 * eta2) * xi * xi
            + (-21.571435779762044 + 981.2158224673428 * eta
               - 3239.5664895930286 * eta2) * xi * xi * xi)


def alpha2_fun(eta, xi):
    eta2 = eta * eta
    return (-0.07020209449091723 - 0.16269798450687084 * eta
            + (-0.1872514685185499 + 1.138313650449945 * eta
               - 2.8334196304430046 * eta2) * xi
            + (-0.17137955686840617 + 1.7197549338119527 * eta
               - 4.539717148261272 * eta2) * xi * xi
            + (-0.049983437357548705 + 0.6062072055948309 * eta
               - 1.682769616644546 * eta2) * xi * xi * xi)


def alpha3_fun(eta, xi):
    eta2 = eta * eta
    return (9.5988072383479 - 397.05438595557433 * eta
            + (16.202126189517813 - 1574.8286986717037 * eta
               + 3600.3410843831093 * eta2) * xi
            + (27.092429659075467 - 1786.482357315139 * eta
               + 5152.919378666511 * eta2) * xi * xi
            + (11.175710130033895 - 577.7999423177481 * eta
               + 1808.730762932043 * eta2) * xi * xi * xi)


def alpha4_fun(eta, xi):
    eta2 = eta * eta
    return (-0.02989487384493607 + 1.4022106448583738 * eta
            + (-0.07356049468633846 + 0.8337006542278661 * eta
               + 0.2240008282397391 * eta2) * xi
            + (-0.055202870001177226 + 0.5667186343606578 * eta
               + 0.7186931973380503 * eta2) * xi * xi
            + (-0.015507437354325743 + 0.15750322779277187 * eta
               + 0.21076815715176228 * eta2) * xi * xi * xi)


def alpha5_fun(eta, xi):
    eta2 = eta * eta
    return (0.9974408278363099 - 0.007884449714907203 * eta
            + (-0.059046901195591035 + 1.3958712396764088 * eta
               - 4.516631601676276 * eta2) * xi
            + (-0.05585343136869692 + 1.7516580039343603 * eta
               - 5.990208965347804 * eta2) * xi * xi
            + (-0.017945336522161195 + 0.5965097794825992 * eta
               - 2.0608879367971804 * eta2) * xi * xi * xi)


LAL_FITS = {
    "rho1": rho1_fun, "rho2": rho2_fun, "rho3": rho3_fun, "v2": v2_fun,
    "gamma1": gamma1_fun, "gamma2": gamma2_fun, "gamma3": gamma3_fun,
    "sigma1": sigma1_fun, "sigma2": sigma2_fun, "sigma3": sigma3_fun,
    "sigma4": sigma4_fun,
    "beta1": beta1_fun, "beta2": beta2_fun, "beta3": beta3_fun,
    "alpha1": alpha1_fun, "alpha2": alpha2_fun, "alpha3": alpha3_fun,
    "alpha4": alpha4_fun, "alpha5": alpha5_fun,
}

# calibration grid of the PhenomD fits: q <= 18 (eta >= 0.0453), |chi| <= 0.85
# (to 0.98 at equal mass); probe slightly beyond
ETAS = np.array([0.045, 0.08, 0.16, 0.2, 0.22, 0.25])
XIS = np.array([-1.95, -1.5, -1.0, -0.5, -0.15, 0.0])  # xi = chiPN - 1


def test_every_coefficient_matches_lal_form_transcription():
    assert set(LAL_FITS) == set(_COEFFS)
    for name, lal_fn in LAL_FITS.items():
        for eta in ETAS:
            for xi in XIS:
                ours = float(_fit(name, eta, xi))
                theirs = lal_fn(eta, xi)
                np.testing.assert_allclose(
                    ours, theirs, rtol=1e-12,
                    err_msg=f"{name} disagrees at eta={eta}, xi={xi}")


def test_final_spin_second_source():
    """Husa et al. 2016 eq. 3.6 written in LAL's FinalSpin0815 layout
    (s = total aligned spin m1^2 chi1 + m2^2 chi2, NOT normalized)."""
    for eta in ETAS:
        seta = np.sqrt(max(1.0 - 4.0 * eta, 0.0))
        m1, m2 = 0.5 * (1 + seta), 0.5 * (1 - seta)
        for chi1, chi2 in [(0.0, 0.0), (0.7, 0.3), (-0.5, 0.2), (0.85, 0.85)]:
            s = m1 * m1 * chi1 + m2 * m2 * chi2
            eta2, eta3 = eta * eta, eta**3
            expected = eta * (
                3.4641016151377544 - 4.399247300629289 * eta
                + 9.397292189321194 * eta2 - 13.180949901606242 * eta3
                + s * ((1.0 / eta - 0.0850917821418767
                        - 5.837029316602263 * eta)
                       + (0.1014665242971878 - 2.0967746996832157 * eta) * s
                       + (-1.3546806617824356 + 4.108962025369336 * eta)
                       * s * s
                       + (-0.8676969352555539 + 2.064046835273906 * eta)
                       * s**3))
            # f32 runtime: transcription errors land far above 5e-6
            np.testing.assert_allclose(float(final_spin(eta, chi1, chi2)),
                                       expected, rtol=5e-6)


def test_radiated_energy_second_source():
    """Husa et al. 2016 eqs. 3.7/3.8 in LAL's EradRational0815 layout
    (s = (m1^2 chi1 + m2^2 chi2)/(m1^2 + m2^2))."""
    for eta in ETAS:
        seta = np.sqrt(max(1.0 - 4.0 * eta, 0.0))
        m1, m2 = 0.5 * (1 + seta), 0.5 * (1 - seta)
        for chi1, chi2 in [(0.0, 0.0), (0.7, 0.3), (-0.5, 0.2)]:
            s = (m1 * m1 * chi1 + m2 * m2 * chi2) / (m1 * m1 + m2 * m2)
            eta2, eta3 = eta * eta, eta**3
            expected = (eta * (0.055974469826360077
                               + 0.5809510763115132 * eta
                               - 0.9606726679372312 * eta2
                               + 3.352411249771192 * eta3)
                        * (1.0 + (-0.0030302335878845507
                                  - 2.0066110851351073 * eta
                                  + 7.7050567802399215 * eta2) * s)) / \
                (1.0 + (-0.6714403054720589 - 1.4756929437702908 * eta
                        + 7.304676214885011 * eta2) * s)
            np.testing.assert_allclose(
                float(radiated_energy(eta, chi1, chi2)), expected,
                rtol=5e-6)


# ---------------------------------------------------------------------------
# 3.5PN TaylorF2 point-particle phasing pins (LAL XLALSimInspiralPNPhasing_F2
# / Buonanno et al. 2009 eq. 3.18). phi6 includes the -6848/21*(gammaE+ln4)
# constant; the ln v coefficient is -6848/21. Values below computed to f64
# from the published closed forms, independent of the package source.
# ---------------------------------------------------------------------------

_PHI6_PINS = {
    # eta -> phi6(eta, chi=0)
    0.25: -1104.1231610823975,
    0.20: -938.9453763683563,
}


@pytest.mark.parametrize("eta,expected", sorted(_PHI6_PINS.items()))
def test_phi6_pin_nonspinning(eta, expected):
    phi = _tf2_phasing(np.float64(eta), np.sqrt(1.0 - 4.0 * eta), 0.0, 0.0)
    # phi[6] passes through f32 jnp ops; the round-2 bug was off by 27%
    np.testing.assert_allclose(float(phi[6]), expected, rtol=2e-5)
    # effective ln v coefficient: the series applies 3*phi['6log']*log(v)
    np.testing.assert_allclose(3.0 * float(phi["6log"]), -6848.0 / 21.0,
                               rtol=1e-14)


def test_phi6_pin_taylorf2_waveform_path():
    """waveforms.taylorf2_tidal must carry the same (correct) 3PN phasing:
    its phase, evaluated mod 2pi, must match the full published f64 series.
    The round-2 ADVICE bug (3PN ln4 constant a factor 3 small) shifts the
    phase by ~5 rad at v=0.2 — far outside the 0.05 rad tolerance."""
    import jax.numpy as jnp

    from nmma_tpu.gw.waveforms import MSUN_S, taylorf2_tidal

    eta, total = 0.25, 2.8
    m_sec = total * MSUN_S
    p = dict(mass_1=1.4, mass_2=1.4, luminosity_distance=40.0,
             theta_jn=0.0, phase=0.0)
    pins = _tf2_phasing(np.float64(eta), 0.0, 0.0, 0.0)
    for v in (0.15, 0.2, 0.25, 0.3):
        f = v**3 / (np.pi * m_sec)
        hp, _ = taylorf2_tidal(jnp.asarray([f]), p)
        got = np.angle(np.asarray(hp))[0]           # = -psi mod 2pi
        logv = np.log(v)
        series = (1.0 + float(pins[2]) * v**2 + float(pins[3]) * v**3
                  + float(pins[4]) * v**4
                  + float(pins[5]) * (1 + 3 * logv) * v**5
                  + (float(pins[6]) + 3 * float(pins["6log"]) * logv) * v**6
                  + float(pins[7]) * v**7)
        psi = -np.pi / 4.0 + 3.0 / (128.0 * eta * v**5) * series
        dphi = np.angle(np.exp(1j * (got + psi)))   # wrapped difference
        assert abs(dphi) < 0.05, (v, dphi)


def test_transcription_error_detectability():
    """Meta-test: a single-digit perturbation in any table entry is caught
    by the grid diff (the 'Done' criterion of VERDICT next-round #5)."""
    rng = np.random.default_rng(0)
    name = rng.choice(sorted(_COEFFS))
    idx = int(rng.integers(0, 11))
    bad = list(_COEFFS[name])
    bad[idx] = bad[idx] * (1.0 + 1e-6) + 1e-12
    L = bad
    detected = False
    for eta in ETAS:
        for xi in XIS:
            eta2 = eta * eta
            ours = (L[0] + L[1] * eta
                    + xi * (L[2] + L[3] * eta + L[4] * eta2)
                    + xi * xi * (L[5] + L[6] * eta + L[7] * eta2)
                    + xi**3 * (L[8] + L[9] * eta + L[10] * eta2))
            theirs = LAL_FITS[name](eta, xi)
            if not np.isclose(ours, theirs, rtol=1e-9):
                detected = True
    assert detected
