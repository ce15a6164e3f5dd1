"""Pinned data-internal consistency analysis of the GW170817 afterglow
radio compilation (VERDICT r4 "what's weak" #5).

The pinned-VLBI fit (scripts/fit_gw170817_pinned.py) leaves the 6 GHz
band at chi2/dof 4.38 while 3 GHz and 1 keV sit at 0.76/0.33. The
excuse — that the 6 GHz points around the light-curve peak are
internally inconsistent with the 3 GHz band and with each other — was
previously only a script-docstring claim. These tests pin it to the raw
numbers in the reference's shipped data file
(``example_files/lightcurves/AT2017gfo_GRB170817A_corrected.dat``) so
the claim is verifiable and regression-guarded:

1. **Spectral-index violation**: the measured afterglow spectrum is
   F_nu ~ nu^beta with beta = (1-p)/2 ~= -0.584 (p = 2.17, Makhathini
   et al. 2021), i.e. 6 GHz must sit 2.5*0.584*log10(2) = 0.44 mag
   FAINTER than contemporaneous 3 GHz. The shipped 6 GHz point at
   149.3 d (18.912 +/- 0.094) is *brighter* than 3 GHz at 163.0 d
   (18.923 +/- 0.358) — and 149.3 d is on the RISING side of the
   ~160 d peak, which makes the expected deficit strictly larger.
2. **Duplicate-epoch inconsistency**: two 6 GHz points carry the same
   timestamp (2018-01-27T10:03:17, 162.9 d) yet differ by 0.30 mag
   (19.132 +/- 0.173 vs 19.435 +/- 0.132) — no model can fit both.

Neither violation is individually >3 sigma (the 3 GHz comparison point
has a 0.36 mag error), but together they bound the best achievable
6 GHz chi2/dof from the data alone: the duplicate pair contributes
chi2 >= delta^2 / (s1^2+s2^2) / 2 per point regardless of the model.
The sampled-systematic closure lives in
scripts/fit_gw170817_pinned.py --sample-syst (reference semantics:
em_syst_err, nmma/em/em_likelihood.py:214-222).
"""

import numpy as np

DATA = ("/root/reference/example_files/lightcurves/"
        "AT2017gfo_GRB170817A_corrected.dat")
TRIGGER = 57982.5285236896
P_RADIO = 2.17                       # Makhathini et al. (2021) fit
BETA = (1.0 - P_RADIO) / 2.0         # F_nu ~ nu^beta above nu_m


def _load(band):
    from nmma_tpu.io import load_em_observations
    sub = load_em_observations(DATA)[band]
    t = np.asarray(sub["time"]) - TRIGGER
    return t, np.asarray(sub["mag"]), np.asarray(sub["mag_error"])


def test_3_to_6ghz_spectral_index_violation():
    t3, m3, e3 = _load("radio-3GHz")
    t6, m6, e6 = _load("radio-6GHz")
    # the 149.3 d 6 GHz point and the nearest-in-time 3 GHz point
    i6 = int(np.argmin(np.abs(t6 - 149.3)))
    i3 = int(np.argmin(np.abs(t3 - t6[i6])))
    assert abs(t6[i6] - 149.3) < 1.0, t6[i6]
    assert abs(t3[i3] - 163.0) < 1.0, t3[i3]
    # expected 6 GHz deficit from the spectrum alone (ignoring that the
    # 6 GHz epoch is 14 d earlier on the rising side, which only makes
    # the true deficit larger)
    expected_dmag = -2.5 * BETA * np.log10(2.0)        # +0.44 mag fainter
    observed_dmag = m6[i6] - m3[i3]                    # -0.011: brighter!
    assert expected_dmag > 0.43
    assert observed_dmag < 0.0, (m6[i6], m3[i3])
    sigma = float(np.hypot(e6[i6], e3[i3]))
    violation_sigma = (expected_dmag - observed_dmag) / sigma
    # pinned: a ~1.2-sigma single-pair violation in the direction that
    # inflates 6 GHz chi2 under any nu^beta model
    assert violation_sigma > 1.0, violation_sigma


def test_6ghz_duplicate_epoch_inconsistency():
    t6, m6, e6 = _load("radio-6GHz")
    order = np.argsort(t6)
    t6, m6, e6 = t6[order], m6[order], e6[order]
    dup = np.where(np.diff(t6) < 1e-6)[0]
    assert dup.size >= 1, "expected a duplicated 6 GHz epoch"
    i = int(dup[0])
    assert abs(t6[i] - 162.9) < 0.5, t6[i]
    dmag = abs(m6[i + 1] - m6[i])
    assert dmag > 0.29, dmag                           # the 0.30 mag split
    # irreducible chi2 contribution of the pair under ANY model m*:
    # min_m* [(m1-m*)^2/s1^2 + (m2-m*)^2/s2^2] = dmag^2/(s1^2+s2^2)
    chi2_floor = dmag ** 2 / (e6[i] ** 2 + e6[i + 1] ** 2)
    assert chi2_floor > 1.9, chi2_floor
