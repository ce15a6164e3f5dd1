"""GWF / IGWD frame format (nmma reads these via gwpy->frameCPP,
gw_inputs.py:4). Round-trips through the spec-v8 writer plus unit checks
on the dictionary-driven parser and FrVect decompression modes."""

import struct

import numpy as np
import pytest

from nmma_tpu.gw.gwf import (_decompress_vect, gwf_channels, read_gwf,
                             write_gwf)
from nmma_tpu.gw.strain import StrainSeries, read_strain_file

GPS = 1187008882.43
RATE = 4096.0


def _series(seed, n=8192):
    rng = np.random.default_rng(seed)
    return StrainSeries(1e-21 * rng.normal(size=n), GPS, RATE)


def test_roundtrip_single_channel_gzip(tmp_path):
    s = _series(0)
    path = tmp_path / "H-H1_TEST-1187008882-2.gwf"
    write_gwf(str(path), {"H1:GWOSC-STRAIN": s})
    assert gwf_channels(str(path)) == ["H1:GWOSC-STRAIN"]

    out = read_gwf(str(path), "H1:GWOSC-STRAIN")
    assert out.t0 == pytest.approx(GPS, abs=1e-6)
    assert out.sample_rate == pytest.approx(RATE)
    np.testing.assert_array_equal(out.data, s.data)

    # channel=None resolves when unambiguous
    out2 = read_gwf(str(path))
    np.testing.assert_array_equal(out2.data, s.data)


def test_roundtrip_multi_channel_raw(tmp_path):
    chans = {"H1:STRAIN": _series(1), "H1:AUX": _series(2)}
    path = tmp_path / "multi.gwf"
    write_gwf(str(path), chans, compress="raw")
    assert gwf_channels(str(path)) == ["H1:AUX", "H1:STRAIN"]
    for name, s in chans.items():
        out = read_gwf(str(path), name)
        np.testing.assert_array_equal(out.data, s.data)
    with pytest.raises(ValueError, match="multiple channels"):
        read_gwf(str(path))
    with pytest.raises(ValueError, match="not found"):
        read_gwf(str(path), "L1:NOPE")


def test_read_strain_file_dispatches_gwf(tmp_path):
    s = _series(3)
    path = tmp_path / "file.gwf"
    write_gwf(str(path), {"L1:STRAIN": s})
    out = read_strain_file(str(path), channel="L1:STRAIN")
    np.testing.assert_array_equal(out.data, s.data)


def test_integer_data_roundtrip(tmp_path):
    data = np.arange(-500, 500, dtype=np.int32)
    s = StrainSeries(data, GPS, RATE)
    path = tmp_path / "ints.gwf"
    write_gwf(str(path), {"X1:COUNTS": s})
    out = read_gwf(str(path), "X1:COUNTS")
    np.testing.assert_array_equal(out.data, data.astype(np.float64))


def test_decompress_differentiated_gzip():
    """FrVect mode 3: gzip of first differences, int vectors."""
    import zlib
    values = np.cumsum(np.arange(100, dtype=np.int32) - 50)
    diffs = np.diff(np.concatenate([[0], values])).astype("<i4")
    vect = {"compress": 3, "type": 4, "nData": 100,
            "data": zlib.compress(diffs.tobytes())}
    out = _decompress_vect(vect, "<")
    np.testing.assert_array_equal(out, values)


def test_decompress_zero_suppress_raises():
    vect = {"compress": 8, "type": 4, "nData": 4, "data": b"\x00" * 16}
    with pytest.raises(NotImplementedError, match="zero-suppress"):
        _decompress_vect(vect, "<")


def test_bad_magic_rejected(tmp_path):
    path = tmp_path / "junk.gwf"
    path.write_bytes(b"NOTIGWD" + b"\x00" * 64)
    with pytest.raises(ValueError, match="IGWD"):
        read_gwf(str(path))


def test_gwf_strain_through_likelihood_setup(tmp_path):
    """End-to-end: a GWF strain file feeds interferometer_from_files."""
    from nmma_tpu.gw.strain import interferometer_from_files
    n = int(64 * RATE)
    rng = np.random.default_rng(7)
    s = StrainSeries(1e-21 * rng.normal(size=n), GPS, RATE)
    path = tmp_path / "seg.gwf"
    write_gwf(str(path), {"H1:GWOSC-STRAIN": s})
    ifo = interferometer_from_files(
        "H1", str(path), trigger_time=GPS + 58.0,
        channel="H1:GWOSC-STRAIN", duration=4.0, post_trigger=2.0,
        f_min=20.0, f_max=512.0)
    assert np.all(np.isfinite(ifo.psd)) and np.all(ifo.psd > 0)
    assert ifo.duration == pytest.approx(4.0)


def test_decompress_differentiated_gzip_float():
    """FrVect mode 3 with FLOAT data: sub-unity differences must
    accumulate as float (an int cast zeroes them)."""
    import zlib
    rng = np.random.default_rng(0)
    values = np.cumsum(rng.normal(0.0, 0.3, 64)).astype("<f8")
    diffs = np.diff(np.concatenate([[0.0], values])).astype("<f8")
    vect = {"compress": 3, "type": 2, "nData": 64,
            "data": zlib.compress(diffs.tobytes())}
    out = _decompress_vect(vect, "<")
    np.testing.assert_allclose(out, values, rtol=1e-12)


def test_decompress_opposite_endian_flag():
    """+256 means opposite of the FILE's endianness, both directions."""
    vals = np.array([1.5, -2.25, 3.0], dtype="f8")
    # little-endian file, flagged vect -> big-endian data
    vect = {"compress": 256, "type": 2, "nData": 3,
            "data": vals.astype(">f8").tobytes()}
    np.testing.assert_array_equal(_decompress_vect(vect, "<"), vals)
    # big-endian file, flagged vect -> little-endian data
    vect = {"compress": 256, "type": 2, "nData": 3,
            "data": vals.astype("<f8").tobytes()}
    np.testing.assert_array_equal(_decompress_vect(vect, ">"), vals)
    # big-endian file, unflagged -> big-endian data
    vect = {"compress": 0, "type": 2, "nData": 3,
            "data": vals.astype(">f8").tobytes()}
    np.testing.assert_array_equal(_decompress_vect(vect, ">"), vals)


def test_writer_chains_procdata_next(tmp_path):
    """Spec-compliant readers walk FrameH.procData -> next; every
    channel of a multi-channel file must be reachable along the chain."""
    from nmma_tpu.gw.gwf import _scan, write_gwf
    t0, sr, n = 1000000000.0, 256.0, 512
    series = {f"X1:CH{i}": StrainSeries(
        data=np.sin(np.arange(n) * (0.01 + 0.003 * i)),
        t0=t0, sample_rate=sr)
        for i in range(3)}
    path = str(tmp_path / "multi.gwf")
    write_gwf(path, series)
    version, endian, dicts, instances, _ = _scan(path)
    by_name = {v["name"]: k for k, v in dicts.items()}
    proc_cls = by_name["FrProcData"]
    frameh = next(v for (c, _), v in instances.items()
                  if c == by_name["FrameH"])
    # walk the chain from FrameH.procData
    seen = []
    ptr = frameh["procData"]
    while ptr and ptr[0] != 0:
        node = instances[(ptr[0], ptr[1])]
        seen.append(node["name"])
        ptr = node["next"]
    assert sorted(seen) == sorted(series.keys())
