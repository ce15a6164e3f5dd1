"""POSSIS/Kasen/LANL spectra -> light-curve converters (make_lcs path)."""

import os

import numpy as np
import pytest

C_CGS = 2.99792458e10
AB_ZP = 3631e-23


def _flat_fnu_flam(wave_aa, fnu=AB_ZP):
    """flam for a flat f_nu spectrum: every AB mag must equal
    -2.5 log10(fnu/3631Jy)."""
    return fnu * C_CGS / (wave_aa ** 2 * 1e-8)


def test_band_mags_flat_spectrum_oracle():
    from nmma_tpu.io.radiative import band_mags_from_spectra
    wave = np.geomspace(1000.0, 30000.0, 400)
    flam = np.stack([_flat_fnu_flam(wave),
                     _flat_fnu_flam(wave, 10.0 ** (-0.4 * 5) * AB_ZP)])
    mags = band_mags_from_spectra(wave, flam, ["ztfg", "ztfr", "2massj"])
    assert np.allclose(mags[:, 0], 0.0, atol=1e-3)
    assert np.allclose(mags[:, 1], 5.0, atol=1e-3)
    # filter outside the wavelength coverage -> inf
    mags2 = band_mags_from_spectra(wave, flam, ["radio-3GHz"])
    assert np.all(~np.isfinite(mags2))


def _write_possis_ascii(path, n_obs=3, n_wave=64, n_time=20):
    wave = np.geomspace(1500.0, 25000.0, n_wave)
    rows = []
    flam_10pc = _flat_fnu_flam(wave)     # files store flux at 10 pc
    for _ in range(n_obs):
        block = np.column_stack([wave] +
                                [flam_10pc * (1 + 0.1 * t)
                                 for t in range(n_time)])
        rows.append(block)
    body = np.vstack(rows)
    with open(path, "w") as fh:
        fh.write(f"{n_obs}\n{n_wave}\n{n_time} 0.5 10.0\n")
        np.savetxt(fh, body)


def test_possis_ascii_roundtrip(tmp_path):
    from nmma_tpu.io.radiative import read_possis_ascii
    p = str(tmp_path / "nph_spectra.txt")
    _write_possis_ascii(p)
    time, thetas, wave, flux = read_possis_ascii(p)
    assert len(time) == 20 and len(thetas) == 3
    assert wave.shape == (3, 64) and flux.shape == (3, 20, 64)
    assert thetas[0] == pytest.approx(90.0) and thetas[-1] == pytest.approx(0.0)


def test_kasen_h5_reader(tmp_path):
    h5py = pytest.importorskip("h5py")
    from nmma_tpu.io.radiative import read_kasen_h5
    p = str(tmp_path / "kasen.h5")
    nu = np.geomspace(1e13, 3e15, 128)[::-1]          # descending like files
    time = np.linspace(0.1, 15.0, 30) * 86400.0
    lnu = np.full((30, 128), 1e25)
    lnu[5, 40] = 0.0                                   # a data hole
    with h5py.File(p, "w") as f:
        f["nu"] = nu
        f["time"] = time
        f["Lnu"] = lnu
    t_days, wave, flam, lnu_s, nu_s = read_kasen_h5(p)
    assert np.all(np.diff(wave) > 0)
    assert t_days[0] == pytest.approx(0.1)
    assert np.all(np.isfinite(flam)) and np.all(flam > 0)
    # smoothing must have filled the hole to within the smooth envelope
    assert lnu_s.min() > 1e22


def _write_lanl_spectra(path, n_time=6, n_wave=32, n_angles=4):
    wave_lo = np.geomspace(1e-5, 2e-4, n_wave)         # cm
    wave_hi = wave_lo * 1.05
    with open(path, "w") as fh:
        for it in range(n_time):
            fh.write(f"time (days) = {0.5 + it}\n")
            for iw in range(n_wave):
                specs = " ".join(f"{1e-12 * (1 + a + it):.6e}"
                                 for a in range(n_angles))
                fh.write(f"{wave_lo[iw]:.6e} {wave_hi[iw]:.6e} {specs}\n")


def test_lanl_spectra_reader(tmp_path):
    from nmma_tpu.io.radiative import lanl_thetas, read_lanl_spectra
    p = str(tmp_path / "Run_TP_dyn_all_lanth_wind2_all_md0.01_vd0.3_"
                       "mw0.001_vw0.05_spec_2020.dat")
    _write_lanl_spectra(p)
    times, wave_aa, per_angle = read_lanl_spectra(p, angles=range(4))
    assert list(times) == [0.5, 1.5, 2.5, 3.5, 4.5, 5.5]
    assert wave_aa.shape == (32,)
    # n_angles multiplier applied (reference :374)
    assert per_angle[1][0, 0] == pytest.approx(2e-12 * 4)
    th = lanl_thetas(4)
    assert th[0] == pytest.approx(180.0) and th[-1] == pytest.approx(0.0)
    with pytest.raises(IndexError):
        read_lanl_spectra(p, angles=[7])


def test_make_lcs_cli_possis(tmp_path):
    from nmma_tpu.cli.tools import make_lcs
    modeldir = tmp_path / "model"
    lcdir = tmp_path / "lcs"
    modeldir.mkdir()
    _write_possis_ascii(str(modeldir / "nph1e6_mej0.05.txt"))
    written = make_lcs(["--modeldir", str(modeldir), "--lcdir", str(lcdir),
                        "--filters", "ztfg,ztfr"])
    assert len(written) == 3                      # one per viewing angle
    assert any("theta0.00" in w for w in written)
    # flat-f_nu spectrum at t=0 scaling -> absolute mag 0 at first epoch
    from nmma_tpu.io import load_em_observations
    data = load_em_observations(written[0], format="model")
    assert data["ztfg"]["mag"][0] == pytest.approx(0.0, abs=2e-2)
