"""GWOSC event-API strain fetching against a localhost server serving the
documented eventapi JSON schema + GWOSC-layout HDF5 bulk files (the
zero-egress stand-in for gwosc.org; nmma/gw/gw_inputs.py fetches the same
data through bilby_pipe/gwpy)."""

import json
import threading
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from nmma_tpu.gw import fetch

GPS_START = 1187008867
RATE = 4096
DURATION = 32


def _write_gwosc_hdf5(path, seed):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(seed)
    data = 1e-21 * rng.normal(size=DURATION * RATE)
    with h5py.File(path, "w") as f:
        ds = f.create_dataset("strain/Strain", data=data)
        ds.attrs["Xspacing"] = 1.0 / RATE
        ds.attrs["Xstart"] = float(GPS_START)
        f.create_dataset("meta/GPSstart", data=GPS_START)
        f.create_dataset("meta/Duration", data=DURATION)
    return data


@pytest.fixture()
def gwosc_server(tmp_path):
    root = tmp_path / "gwosc_root"
    api_dir = root / "eventapi" / "json" / "event" / "GW170817"
    files = root / "files"
    api_dir.mkdir(parents=True)
    files.mkdir(parents=True)

    data = {}
    for det in ("H1", "L1"):
        name = f"{det}-{GPS_START}-{DURATION}.hdf5"
        data[det] = _write_gwosc_hdf5(files / name, seed=hash(det) % 100)

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        lambda *a, **kw: SimpleHTTPRequestHandler(*a, directory=str(root),
                                                  **kw))
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def entry(det, dur, rate):
        return {"detector": det, "GPSstart": GPS_START, "duration": dur,
                "sampling_rate": rate, "format": "hdf5",
                "url": f"{base}/files/{det}-{GPS_START}-{DURATION}.hdf5"}

    payload = {"events": {
        "GW170817-v2": {"strain": [entry("H1", DURATION, RATE)]},
        "GW170817-v3": {"strain": [
            entry(det, dur, rate)
            for det in ("H1", "L1")
            for dur, rate in ((DURATION, RATE), (4096, 16384))]},
    }}
    (api_dir / "index.json").write_text(json.dumps(payload))
    # SimpleHTTPRequestHandler serves directory URLs via index.html only;
    # write the payload there too so the trailing-slash GET works
    (api_dir / "index.html").write_text(json.dumps(payload))

    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield base, data
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_event_catalog_picks_highest_version(gwosc_server):
    base, _ = gwosc_server
    strain = fetch.event_strain_catalog("GW170817", base_url=base)
    assert {e["detector"] for e in strain} == {"H1", "L1"}
    assert len(strain) == 4                       # v3, both variants
    v2 = fetch.event_strain_catalog("GW170817", base_url=base, version=2)
    assert len(v2) == 1 and v2[0]["detector"] == "H1"
    with pytest.raises(ValueError, match="no version"):
        fetch.event_strain_catalog("GW170817", base_url=base, version=9)


def test_fetch_event_strain_roundtrip(gwosc_server, tmp_path):
    base, data = gwosc_server
    series = fetch.fetch_event_strain(
        "GW170817", ["H1", "L1"], duration=DURATION, sample_rate=RATE,
        cache_dir=str(tmp_path / "cache"), base_url=base)
    for det in ("H1", "L1"):
        s = series[det]
        assert s.t0 == GPS_START
        assert s.sample_rate == RATE
        np.testing.assert_array_equal(np.asarray(s.data), data[det])
    # cached: a second call re-reads the file instead of re-downloading
    import os
    cached = next((tmp_path / "cache").glob("H1-*.hdf5"))
    mtime = os.path.getmtime(cached)
    series2 = fetch.fetch_event_strain(
        "GW170817", ["H1"], cache_dir=str(tmp_path / "cache"),
        base_url=base)
    np.testing.assert_array_equal(np.asarray(series2["H1"].data),
                                  data["H1"])
    assert os.path.getmtime(cached) == mtime


def test_interferometers_from_gwosc(gwosc_server, tmp_path):
    base, _ = gwosc_server
    trigger = GPS_START + 26.0
    ifos = fetch.interferometers_from_gwosc(
        ["H1", "L1"], "GW170817", trigger, duration=4.0, post_trigger=2.0,
        f_min=20.0, f_max=512.0, cache_dir=str(tmp_path / "cache"),
        base_url=base)
    assert [i.name for i in ifos] == ["H1", "L1"]
    for ifo in ifos:
        assert ifo.duration == pytest.approx(4.0)
        assert np.all(np.isfinite(ifo.psd)) and np.all(ifo.psd > 0)
        assert np.all(np.isfinite(ifo.strain.real))
        assert ifo.frequencies[0] >= 20.0
        assert ifo.frequencies[-1] <= 512.0
