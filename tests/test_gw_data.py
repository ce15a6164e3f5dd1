"""Real GW-data path: strain IO, Welch PSD, time marginalization,
maximum-likelihood fiducial search (VERDICT r1 #4)."""

import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmma_tpu.gw import (GWTransientLikelihood, InterferometerData,
                         RelativeBinningGWLikelihood, imrphenomd)
from nmma_tpu.gw.likelihood import project_signal
from nmma_tpu.gw.strain import (StrainSeries, fft_analysis_segment,
                                interferometer_from_data, median_bias,
                                read_strain_file, tukey_window, welch_psd)

FS = 1024.0
T0 = 1000000000.0


def _white_series(duration, sigma=1.0e-23, seed=1):
    rng = np.random.default_rng(seed)
    n = int(duration * FS)
    return StrainSeries(rng.normal(0.0, sigma, n), T0, FS)


# ---------------------------------------------------------------------------
# IO round trips
# ---------------------------------------------------------------------------

def test_strain_io_roundtrip(tmp_path):
    series = _white_series(4.0)
    # GWOSC-style hdf5
    p = tmp_path / "strain.hdf5"
    with h5py.File(p, "w") as f:
        ds = f.create_dataset("strain/Strain", data=series.data)
        ds.attrs["Xspacing"] = 1.0 / FS
        f.create_dataset("meta/GPSstart", data=T0)
    back = read_strain_file(str(p))
    np.testing.assert_allclose(back.data, series.data)
    assert back.t0 == T0 and back.sample_rate == FS

    # two-column ascii
    p2 = tmp_path / "strain.txt"
    np.savetxt(p2, np.column_stack([series.times[:1024],
                                    series.data[:1024]]))
    back2 = read_strain_file(str(p2))
    np.testing.assert_allclose(back2.data, series.data[:1024])
    np.testing.assert_allclose(back2.sample_rate, FS, rtol=1e-6)

    # single-column ascii with GWOSC-style header
    p3 = tmp_path / "strain_single.txt"
    with open(p3, "w") as f:
        f.write(f"# GPS start: {T0}\n# sample rate (Hz) = {FS}\n")
        np.savetxt(f, series.data[:512])
    back3 = read_strain_file(str(p3))
    assert back3.t0 == T0 and back3.sample_rate == FS

    # npz
    p4 = tmp_path / "strain.npz"
    np.savez(p4, strain=series.data, t0=T0, sample_rate=FS)
    back4 = read_strain_file(str(p4))
    np.testing.assert_allclose(back4.data, series.data)

    # .gwf is a supported format since the IGWD reader landed: a
    # missing file is FileNotFoundError (not unsupported-suffix
    # ValueError)
    with pytest.raises(FileNotFoundError):
        read_strain_file("nonexistent.gwf")


def test_crop_bounds():
    series = _white_series(4.0)
    sub = series.crop(T0 + 1.0, T0 + 3.0)
    assert sub.duration == 2.0 and sub.t0 == T0 + 1.0
    with pytest.raises(ValueError):
        series.crop(T0 - 1.0, T0 + 1.0)


# ---------------------------------------------------------------------------
# PSD estimation
# ---------------------------------------------------------------------------

def test_median_welch_psd_white_noise():
    sigma = 2.0e-23
    series = _white_series(256.0, sigma=sigma)
    freqs, psd = welch_psd(series, segment_duration=4.0)
    expected = 2.0 * sigma ** 2 / FS     # one-sided white PSD
    band = (freqs > 20.0) & (freqs < 400.0)
    np.testing.assert_allclose(np.median(psd[band]), expected, rtol=0.1)
    # mean method agrees with median after bias correction
    _, psd_mean = welch_psd(series, segment_duration=4.0, method="mean")
    np.testing.assert_allclose(np.median(psd_mean[band]), expected,
                               rtol=0.1)
    assert median_bias(1) == 1.0
    assert 0.6 < median_bias(127) < 0.8   # -> ln 2 ~ 0.693


def test_tukey_window_properties():
    w = tukey_window(1024, 0.1)
    assert w[0] < 1e-10 and w[-1] < 1e-10
    assert np.all(w[100:-100] == 1.0)
    np.testing.assert_allclose(tukey_window(64, 0.0), np.ones(64))


# ---------------------------------------------------------------------------
# end-to-end: noise + injected BBH signal from disk to posterior peak
# ---------------------------------------------------------------------------

INJ = dict(mass_1=36.0, mass_2=29.0, chi_1=0.1, chi_2=-0.05,
           luminosity_distance=800.0, theta_jn=0.5, phase=1.2,
           ra=1.3, dec=-0.5, psi=0.7, geocent_time=0.0)


@pytest.fixture(scope="module")
def injected_ifos():
    """72 s of white noise per detector with an IMRPhenomD BBH injected
    4 s before the end, assembled purely through the file-free data path."""
    duration, sigma = 8.0, 4.0e-23
    trigger = T0 + 68.0
    ifos = []
    for k, name in enumerate(("H1", "L1")):
        series = _white_series(72.0, sigma=sigma, seed=10 + k)
        # inject: waveform on the analysis segment's frequency grid
        seg_start = trigger + 2.0 - duration
        n = int(duration * FS)
        freqs = np.fft.rfftfreq(n, d=1.0 / FS)
        from nmma_tpu.gw import get_detector
        h_f = np.asarray(jax.jit(
            lambda f, det=get_detector(name): project_signal(
                det, imrphenomd, f, INJ, trigger))(freqs[1:]))
        h_full = np.zeros(len(freqs), dtype=np.complex128)
        h_full[1:] = h_f
        # place the merger (duration - post_trigger) into the segment
        h_full *= np.exp(-2j * np.pi * freqs * (duration - 2.0))
        h_t = np.fft.irfft(h_full * FS, n=n)
        i0 = int(round((seg_start - series.t0) * FS))
        series.data[i0:i0 + n] += h_t
        ifos.append(interferometer_from_data(
            name, series, trigger, duration=duration, post_trigger=2.0,
            f_min=20.0, f_max=500.0))
    return ifos, trigger


def test_data_path_recovers_injection(injected_ifos):
    ifos, trigger = injected_ifos
    lk = GWTransientLikelihood(ifos, waveform=imrphenomd,
                               trigger_time=trigger)
    snr = float(lk.optimal_snr(INJ))
    assert snr > 10.0, snr
    logl = float(lk.log_likelihood_ratio(INJ))
    # white noise: logl = rho^2/2 + O(rho)
    assert abs(logl - snr ** 2 / 2.0) < 4.0 * snr, (logl, snr)
    # wrong masses are heavily disfavored
    assert float(lk.log_likelihood_ratio({**INJ, "mass_1": 20.0,
                                          "mass_2": 15.0})) < logl - 50.0


def test_time_marginalization_consistency(injected_ifos):
    ifos, trigger = injected_ifos
    direct = GWTransientLikelihood(ifos, waveform=imrphenomd,
                                   trigger_time=trigger)
    tm = GWTransientLikelihood(ifos, waveform=imrphenomd,
                               trigger_time=trigger,
                               time_marginalization=True)
    l_direct = float(direct.log_likelihood_ratio(INJ))
    l_tm = float(jax.jit(tm.log_likelihood_ratio)(INJ))
    # marginalizing over a window containing the peak: close to, but
    # never above, the peak logL (volume factor ~ log(dt_corr / T))
    assert l_tm <= l_direct + 1.0
    assert l_tm > 0.5 * l_direct
    # time+phase+distance jointly
    tpd = GWTransientLikelihood(
        ifos, waveform=imrphenomd, trigger_time=trigger,
        time_marginalization=True, phase_marginalization=True,
        distance_marginalization=True, distance_bounds=(100.0, 3000.0))
    l_tpd = float(jax.jit(tpd.log_likelihood_ratio)(INJ))
    assert np.isfinite(l_tpd) and l_tpd > 0.3 * l_direct


def test_fiducial_search_finds_peak(injected_ifos):
    from nmma_tpu.gw.fiducial import find_fiducial
    from nmma_tpu.priors import parse_prior_dict
    ifos, trigger = injected_ifos
    priors = parse_prior_dict(
        "mass_1 = Uniform(minimum=30., maximum=42.)\n"
        "mass_2 = Uniform(minimum=24., maximum=34.)\n"
        "luminosity_distance = Uniform(minimum=300., maximum=1500.)\n"
    )
    fixed = {k: INJ[k] for k in ("ra", "dec", "psi", "theta_jn",
                                 "chi_1", "chi_2")}
    fid, logl = find_fiducial(ifos, priors, imrphenomd, trigger,
                              n_rounds=3, batch=128, seed=2, fixed=fixed)
    ref = GWTransientLikelihood(
        ifos, waveform=imrphenomd, trigger_time=trigger,
        phase_marginalization=True, time_marginalization=True)
    l_true = float(ref.log_likelihood_ratio(INJ))
    assert logl > l_true - 0.3 * abs(l_true), (logl, l_true)
    # chirp mass recovered within a few percent
    def mchirp(m1, m2):
        return (m1 * m2) ** 0.6 / (m1 + m2) ** 0.2
    assert abs(mchirp(fid["mass_1"], fid["mass_2"])
               - mchirp(INJ["mass_1"], INJ["mass_2"])) < 2.0
    # the fiducial drives a working relative-binning likelihood
    rb = RelativeBinningGWLikelihood(ifos, fid, waveform=imrphenomd,
                                     trigger_time=trigger)
    assert np.isfinite(float(rb.log_likelihood_ratio(fid)))


def test_calibration_marginalization(injected_ifos):
    """Draw-based calibration marginalization: identity draws reproduce
    the unmarginalized logL; envelope-scale uncertainty costs a bounded
    amount of logL at the injection and stays finite."""
    from nmma_tpu.gw.strain import calibration_draws_from_envelope
    ifos, trigger = injected_ifos
    base = GWTransientLikelihood(ifos, waveform=imrphenomd,
                                 trigger_time=trigger)
    l0 = float(base.log_likelihood_ratio(INJ))

    ident = {ifo.name: np.ones((8, len(ifo.frequencies)),
                               dtype=np.complex128) for ifo in ifos}
    lk_id = GWTransientLikelihood(ifos, waveform=imrphenomd,
                                  trigger_time=trigger,
                                  calibration_draws=ident)
    np.testing.assert_allclose(float(lk_id.log_likelihood_ratio(INJ)), l0,
                               rtol=1e-4)

    # synthetic envelope: ~3% amplitude, ~0.03 rad phase uncertainty
    f_env = np.geomspace(10.0, 1000.0, 20)
    env = np.column_stack([
        f_env, np.ones_like(f_env), np.zeros_like(f_env),
        np.full_like(f_env, 0.97), np.full_like(f_env, -0.03),
        np.full_like(f_env, 1.03), np.full_like(f_env, 0.03)])
    draws = {ifo.name: calibration_draws_from_envelope(
        env, np.asarray(ifo.frequencies), n_draws=32, seed=3)
        for ifo in ifos}
    lk_cal = GWTransientLikelihood(ifos, waveform=imrphenomd,
                                   trigger_time=trigger,
                                   calibration_draws=draws)
    l_cal = float(jax.jit(lk_cal.log_likelihood_ratio)(INJ))
    snr = float(base.optimal_snr(INJ))
    assert np.isfinite(l_cal)
    # 3% response error on a rho~15-25 signal moves logL by
    # O((0.03 rho)^2): a small cost, or a small gain when a draw fits
    # the noise realisation better than the identity response
    assert abs(l_cal - l0) < 3.0 * (0.05 * snr) ** 2 + 5.0, (l_cal, l0)

    # composes with phase+distance marginalization
    lk_all = GWTransientLikelihood(
        ifos, waveform=imrphenomd, trigger_time=trigger,
        calibration_draws=draws, phase_marginalization=True,
        distance_marginalization=True, distance_bounds=(100.0, 3000.0))
    assert np.isfinite(float(jax.jit(lk_all.log_likelihood_ratio)(INJ)))


def test_psd_carries_tukey_window_factor():
    """The analysis segment is Tukey-windowed, so the stored PSD must be
    the unwindowed-noise PSD times mean(w^2) (bilby window_factor) —
    otherwise every inner product is biased high by 1/mean(w^2)."""
    from nmma_tpu.gw.strain import (StrainSeries, interferometer_from_data,
                                    tukey_window)
    rng = np.random.default_rng(0)
    fs, t_len = 512.0, 40.0
    series = StrainSeries(rng.normal(0, 1e-22, int(fs * t_len)),
                          1000000000.0, fs)
    duration, roll_off = 4.0, 0.4
    flat = 1.7e-45
    freqs = np.linspace(0.0, fs / 2, 200)
    ifo = interferometer_from_data(
        "H1", series, trigger_time=1000000000.0 + 36.0,
        duration=duration, post_trigger=2.0, f_min=20.0, f_max=200.0,
        psd=(freqs, np.full_like(freqs, flat)), roll_off=roll_off)
    n = int(duration * fs)
    win = tukey_window(n, 2.0 * roll_off / duration)
    wf = np.mean(win**2)
    assert abs(wf - (1.0 - 5.0 * (2 * roll_off / duration) / 8.0)) < 1e-3
    np.testing.assert_allclose(np.asarray(ifo.psd), flat * wf, rtol=1e-6)


def test_csv_gz_strain(tmp_path):
    import gzip

    from nmma_tpu.gw.strain import read_strain_file
    t = 1000000000.0 + np.arange(512) / 256.0
    d = np.sin(t)
    rows = "\n".join(f"{a},{b}" for a, b in zip(t, d))
    path = tmp_path / "strain.csv.gz"
    with gzip.open(path, "wt") as f:
        f.write(rows + "\n")
    s = read_strain_file(str(path))
    assert abs(s.sample_rate - 256.0) < 1e-6
    np.testing.assert_allclose(s.data, d)


def test_generic_hdf5_with_explicit_metadata(tmp_path):
    import h5py

    from nmma_tpu.gw.strain import read_strain_file
    path = tmp_path / "x.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=np.arange(64, dtype=float))
    s = read_strain_file(str(path), channel="data", t0=5.0,
                         sample_rate=128.0)
    assert s.t0 == 5.0 and s.sample_rate == 128.0
