"""Registry HTTP client (nmma/core/gitlab.py parity) against a localhost
server: models.yaml listing, per-filter downloads, lzma decompression,
SKIP_FILTERS passthrough, local-scan fallback, and the download->ingest->
evaluate end-to-end path on the reference's real Bu2019nsbh_tf weights."""

import lzma
import os
import shutil
import threading
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from nmma_tpu import registry

NSBH_DIR = "/root/reference/nmma/tests/data/Bu2019nsbh_tf"
FILTERS = ["2massks", "sdssu", "ztfr"]


@pytest.fixture()
def registry_server(tmp_path):
    """Serve a reference-layout registry tree over localhost HTTP."""
    joblib = pytest.importorskip("joblib")
    root = tmp_path / "registry_root"
    (root / "models" / "Bu2019nsbh_tf").mkdir(parents=True)

    (root / "models.yaml").write_text(
        "Bu2019nsbh_tf:\n  filters: [" + ", ".join(FILTERS) + "]\n")

    rng = np.random.default_rng(0)
    tt = np.linspace(0.1, 10.0, 50)
    core = {
        f: {
            "tt": tt,
            "VA": rng.normal(size=(50, 10)),
            "mins": rng.uniform(-18, -16, 50),
            "maxs": rng.uniform(-15, -13, 50),
            "n_coeff": 10,
            "param_mins": np.array([-3.0, -3.0, 0.0]),
            "param_maxs": np.array([-1.0, -0.5, 90.0]),
            "model_parameters": ["log10_mej_dyn", "log10_mej_wind",
                                 "KNtheta"],
        }
        for f in FILTERS
    }
    joblib.dump(core, root / "models" / "Bu2019nsbh.joblib")
    for f in FILTERS:
        shutil.copy(os.path.join(NSBH_DIR, f"{f}.h5"),
                    root / "models" / "Bu2019nsbh_tf" / f"{f}.h5")

    handler = lambda *a, **kw: SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(root), **kw)
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_models_list_fetch_and_merge(registry_server, tmp_path):
    home = tmp_path / "home"
    models, used_local = registry.load_models_list(
        str(home), base_url=registry_server)
    assert not used_local
    assert models["Bu2019nsbh_tf"]["filters"] == sorted(FILTERS)
    assert (home / "models.yaml").exists()

    # a locally present model dir merges into the listing
    (home / "LocalOnly").mkdir()
    (home / "LocalOnly" / "LocalOnly_ztfg.joblib").write_bytes(b"x")
    models, _ = registry.load_models_list(str(home),
                                          base_url=registry_server)
    assert models["LocalOnly"]["filters"] == ["ztfg"]


def test_local_fallback_when_registry_unreachable(tmp_path):
    home = tmp_path / "home"
    (home / "OnlyHere").mkdir(parents=True)
    (home / "OnlyHere" / "OnlyHere_sdssr.h5").write_bytes(b"x")
    models, used_local = registry.load_models_list(
        str(home), base_url="http://127.0.0.1:9")   # unroutable
    assert used_local
    assert models["OnlyHere"]["filters"] == ["sdssr"]


def test_download_model_files_and_skip_filters(registry_server, tmp_path):
    home = tmp_path / "home"
    paths, filts = registry.download_model(
        "Bu2019nsbh_tf", filters=["sdssu", "X-ray-1keV"],
        models_home=str(home), base_url=registry_server)
    # core joblib + the one real filter; X-ray passes through untouched
    assert paths[0].endswith("Bu2019nsbh.joblib") and os.path.exists(paths[0])
    assert paths[1].endswith(os.path.join("Bu2019nsbh_tf", "sdssu.h5"))
    assert os.path.exists(paths[1])
    assert filts == ["sdssu", "X-ray-1keV"]
    assert not (home / "Bu2019nsbh_tf" / "2massks.h5").exists()

    with pytest.raises(ValueError, match="does not have filters"):
        registry.download_model("Bu2019nsbh_tf", filters=["nosuchband"],
                                models_home=str(home),
                                base_url=registry_server)
    with pytest.raises(ValueError, match="not found in models list"):
        registry.download_model("NoSuchModel", models_home=str(home),
                                base_url=registry_server)


def test_download_lzma_decompression(registry_server, tmp_path, monkeypatch):
    # stage an .lzma payload next to the registry tree and fetch it
    home = tmp_path / "home2"
    home.mkdir()
    payload = b"surrogate-bytes" * 100
    # write into the served directory (fixture serves tmp_path/registry_root)
    served = tmp_path / "registry_root" / "models" / "comp.joblib.lzma"
    served.write_bytes(lzma.compress(payload))
    dest = registry.download_file(
        f"{registry_server}/models/comp.joblib.lzma",
        str(home / "comp.joblib.lzma"))
    assert dest.endswith("comp.joblib")      # suffix stripped
    assert (home / "comp.joblib").read_bytes() == payload


def test_download_ingest_evaluate_end_to_end(registry_server, tmp_path):
    """The full reference-user path: svdmodel-download a _tf model from
    the registry, ingest the joblib/h5 artifacts, evaluate magnitudes."""
    import jax

    from nmma_tpu.models.svd import svd_surrogate_mags

    home = tmp_path / "home"
    model = registry.load_reference_registry_model(
        "Bu2019nsbh_tf", models_home=str(home), base_url=registry_server)
    assert model.name == "Bu2019nsbh"
    svd_paths = sorted(p.name for p in home.glob("**/*") if p.is_file())
    assert "Bu2019nsbh.joblib" in svd_paths and "ztfr.h5" in svd_paths

    params = {"log10_mej_dyn": -2.0, "log10_mej_wind": -1.5,
              "KNtheta": 30.0}
    t_out = np.linspace(0.5, 8.0, 20)
    mags = np.asarray(jax.jit(
        lambda p: model.mags_fn(p, t_out, None))(params))
    assert mags.shape == (3, 20)
    assert np.all(np.isfinite(mags))

    # second resolve: everything cached, no re-download needed
    paths, _ = registry.download_model("Bu2019nsbh_tf",
                                       models_home=str(home),
                                       base_url=registry_server,
                                       download_if_missing=False)
    assert all(os.path.exists(p) for p in paths)


def test_cli_svdmodel_download(registry_server, tmp_path, monkeypatch):
    from nmma_tpu.cli.tools import svdmodel_download
    home = tmp_path / "clihome"
    out = svdmodel_download([
        "--model", "Bu2019nsbh_tf", "--svd-path", str(home),
        "--filters", "ztfr", "--registry-url", registry_server,
        "--refresh-models-list"])
    assert isinstance(out, list) and len(out) == 2
    assert os.path.exists(out[1])
