"""Pure-numpy FITS bintable I/O + HEALPix + skymap inclination prior."""

import numpy as np
import pytest


def test_fits_bintable_roundtrip(tmp_path):
    from nmma_tpu.io.fits import read_bintable, write_bintable
    path = str(tmp_path / "t.fits")
    cols = {
        "UNIQ": np.array([1028, 1033, 1100], dtype=np.int64),
        "PROBDENSITY": np.array([0.1, 5.0, 0.2]),
        "DISTMU_SAMPLES": np.arange(30, dtype=np.float64).reshape(3, 10),
    }
    write_bintable(path, cols, extra_header={"ORDERING": "NUNIQ"})
    out, header = read_bintable(path)
    assert header["ORDERING"] == "NUNIQ"
    for k in cols:
        assert np.array_equal(out[k], cols[k]), k


def test_healpix_nested_hierarchy():
    from nmma_tpu.io.fits import ang2pix_nest, uniq2nest
    rng = np.random.default_rng(1)
    theta = np.arccos(rng.uniform(-1, 1, 50000))
    phi = rng.uniform(0, 2 * np.pi, 50000)
    for o in range(0, 6):
        lo = ang2pix_nest(2 ** o, theta, phi)
        hi = ang2pix_nest(2 ** (o + 1), theta, phi)
        assert np.all((hi >> 2) == lo)          # nested parent/child
        assert lo.min() >= 0 and lo.max() < 12 * 4 ** o
    # equal-area: occupancy consistent with Poisson
    counts = np.bincount(ang2pix_nest(4, theta, phi), minlength=192)
    assert counts.std() / counts.mean() < 2.5 / np.sqrt(50000 / 192)
    order, nest = uniq2nest(np.array([4 + 7, 16 + 40, 4 ** 8 + 12345]))
    assert list(order) == [0, 1, 7] and list(nest) == [7, 40, 12345]


def _write_synthetic_skymap(path, iota_peak, dl_true, nside=16):
    """MOC-style skymap whose maP pixel prefers cos(iota_peak) at dl_true."""
    from nmma_tpu.io.fits import write_bintable
    n_pix, n_nodes = 6, 10
    rng = np.random.default_rng(0)
    uniq = (4 ** (int(np.log2(nside)) + 1)
            + np.arange(100, 100 + n_pix)).astype(np.int64)
    nodes = np.cos(np.linspace(0, np.pi, n_nodes))   # descending u
    prob = rng.uniform(0.01, 0.1, n_pix)
    prob[2] = 10.0                                   # maP pixel
    probd = np.full((n_pix, n_nodes), 1.0)
    # distance layer: mean closest to dl_true at u = cos(iota_peak)
    mu = 100.0 + 200.0 * np.abs(nodes - np.cos(iota_peak))[None, :] \
        * np.ones((n_pix, 1))
    mu[2] = dl_true + 200.0 * np.abs(nodes - np.cos(iota_peak))
    sig = np.full((n_pix, n_nodes), 15.0)
    dn = np.full((n_pix, n_nodes), 1.0)
    write_bintable(path, {
        "UNIQ": uniq, "PROBDENSITY": prob,
        "PROBDENSITY_SAMPLES": probd, "DISTMU_SAMPLES": mu,
        "DISTSIGMA_SAMPLES": sig, "DISTNORM_SAMPLES": dn})


def test_inclination_prior_from_fits(tmp_path):
    from nmma_tpu.priors.astro import inclination_prior_from_fits
    path = str(tmp_path / "skymap.fits")
    iota_peak = 0.35
    _write_synthetic_skymap(path, iota_peak, dl_true=120.0)
    prior = inclination_prior_from_fits(path, dL=120.0)
    grid = np.linspace(1e-3, np.pi / 2 - 1e-3, 400)
    pdf = np.exp([float(prior.log_prob(g)) for g in grid])

    # independent oracle of the reference formula (prior.py:123-152):
    # p(iota) ∝ N(dL; mu(cos iota), sigma) |sin iota|, folded to [0, pi/2]
    from scipy.stats import norm
    mu_of_u = lambda u: 120.0 + 200.0 * np.abs(u - np.cos(iota_peak))

    def p_iota(i):
        return norm(mu_of_u(np.cos(i)), 15.0).pdf(120.0) * np.sin(i)

    oracle = p_iota(grid) + p_iota(np.pi - grid)
    oracle /= np.trapezoid(oracle, grid)
    pdf_n = pdf / np.trapezoid(pdf, grid)
    # PCHIP through 10 cos-iota nodes vs the exact curve: shape must agree
    assert abs(grid[np.argmax(pdf_n)] - grid[np.argmax(oracle)]) < 0.06
    assert np.max(np.abs(pdf_n - oracle)) < 0.25 * oracle.max()
    # unit-cube transform stays in support
    u = np.linspace(0.01, 0.99, 21)
    x = np.asarray([float(prior.transform(v)) for v in u])
    assert np.all((x >= 0) & (x <= np.pi / 2))
    assert np.all(np.diff(x) > 0)


def test_m4opt_detection_limit_map(tmp_path):
    """m4opt LIMMAG HEALPix lookup (reference em/utils.py:199-210)."""
    from nmma_tpu.io.fits import (detection_limit_from_m4opt_fits,
                                  skymap_pixel_index, write_bintable)

    nside = 8
    npix = 12 * nside * nside
    limmag = np.full(npix, 21.0)
    idx = skymap_pixel_index(150.0, 30.0, nside)
    limmag[idx] = 23.5
    path = tmp_path / "limmag.fits"
    write_bintable(path, {"LIMMAG": limmag},
                   extra_header={"NSIDE": nside})
    got = detection_limit_from_m4opt_fits(path, 150.0, 30.0)
    assert got == 23.5
    assert detection_limit_from_m4opt_fits(path, 0.0, -45.0) == 21.0

    # CLI wiring: the detection limit resolves from the map
    from nmma_tpu.cli.lightcurve_analysis import main
    lc = tmp_path / "lc.dat"
    rows = [f"{59000 + t} ztfr {19 + 0.2 * t:.3f} 0.1"
            for t in np.linspace(0.5, 8.0, 10)]
    lc.write_text("\n".join(rows) + "\n")
    prior = tmp_path / "p.prior"
    prior.write_text(
        "log10_mej = Uniform(minimum=-3., maximum=-1.)\n"
        "log10_vej = Uniform(minimum=-2., maximum=-0.5)\n"
        "beta = 3.0\nlog10_kappa_r = 0.5\n"
        "luminosity_distance = 40.\ntimeshift = 0.\n")
    ana = main([
        "--model", "Me2017", "--outdir", str(tmp_path), "--label", "m4",
        "--prior", str(prior), "--light-curve-data", str(lc),
        "--trigger-time", "59000",
        "--detection-limit-fits-file", str(path),
        "--ra", "150.0", "--dec", "30.0", "--skip-sampling",
    ])
    np.testing.assert_allclose(
        np.asarray(ana.likelihood.detection_limit).ravel(), 23.5)


def test_ang2pix_ring_geometry():
    """RING indexing: matches NESTED at nside=1 (identical layouts),
    covers every pixel uniformly, and orders pixels by z-band."""
    from nmma_tpu.io.fits import ang2pix_nest, ang2pix_ring
    rng = np.random.default_rng(0)
    n = 100000
    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    theta = np.arccos(z)
    np.testing.assert_array_equal(ang2pix_ring(1, theta, phi),
                                  ang2pix_nest(1, theta, phi))
    pix = ang2pix_ring(8, theta, phi)
    counts = np.bincount(pix, minlength=12 * 64)
    assert (counts > 0).all()
    assert counts.std() / counts.mean() < 0.15   # equal-area pixels
    # pixels are numbered north -> south along iso-latitude rings
    ring_of = np.floor_interp = None
    top = pix[z > 0.99]
    bot = pix[z < -0.99]
    assert top.max() < 12 * 64 * 0.1
    assert bot.min() > 12 * 64 * 0.9


def test_header_quoted_string_with_slash(tmp_path):
    """A quoted header value containing '/' must not be truncated at the
    comment separator; doubled quotes unescape."""
    from nmma_tpu.io.fits import _read_header
    card = "TUNIT1  = '1 / sr''s'         / comment here"
    block = (card.ljust(80) + "END".ljust(80)).ljust(2880).encode()
    import io
    cards = _read_header(io.BytesIO(block))
    assert cards["TUNIT1"] == "1 / sr's"


def test_logical_column_decodes_booleans(tmp_path):
    """TFORM 'L' columns come back as real booleans ('F' byte 70 is
    truthy as a raw u1)."""
    from nmma_tpu.io.fits import read_bintable, write_bintable
    path = str(tmp_path / "flags.fits")
    # write_bintable has no L support; craft the table manually from a
    # D column file then patch TFORM/data
    vals = np.array([1.0, 0.0, 1.0], dtype=">f8")
    write_bintable(path, {"X": vals}, {})
    raw = bytearray(open(path, "rb").read())
    # find the TFORM card and the 24-byte data area
    i = raw.find(b"TFORM1  = '1D")
    assert i > 0
    raw[i:i + 80] = ("TFORM1  = '1L      '".ljust(80)).encode()
    j = raw.find(b"NAXIS1  =")
    raw[j:j + 80] = ("NAXIS1  =                    1".ljust(80)).encode()
    # replace the 3*8-byte doubles with 3 logical bytes T, F, T
    data_off = len(raw) - 2880
    raw[data_off:data_off + 2880] = (b"TFT" + b"\x00" * 2877)
    open(path, "wb").write(bytes(raw))
    cols, header = read_bintable(path)
    np.testing.assert_array_equal(cols["X"], [True, False, True])
    assert cols["X"].dtype == np.bool_


def test_m4opt_ring_ordering(tmp_path):
    """detection_limit_from_m4opt_fits honors ORDERING=RING."""
    from nmma_tpu.io.fits import (ang2pix_ring, detection_limit_from_m4opt_fits,
                                  write_bintable)
    nside = 8
    npix = 12 * nside * nside
    limmag = np.linspace(18.0, 24.0, npix)
    ra, dec = 150.0, 30.0
    path = str(tmp_path / "limmag_ring.fits")
    write_bintable(path, {"LIMMAG": limmag.astype(">f8")},
                   {"NSIDE": nside, "ORDERING": "RING"})
    theta = np.radians(90.0 - dec)
    phi = np.radians(ra)
    expect = limmag[int(ang2pix_ring(nside, theta, phi))]
    got = detection_limit_from_m4opt_fits(path, ra, dec)
    assert got == expect
