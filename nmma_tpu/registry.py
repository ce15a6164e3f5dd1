"""Surrogate-model registry: local model home + models.yaml HTTP client.

Counterpart of ``nmma/core/gitlab.py``: the reference resolves surrogate
artifacts from ``$NMMA_MODELS`` / ``~/nmma_models`` and downloads missing
ones from a GitLab registry (rank-0 with an MPI barrier). Here the local
resolution logic is identical (env var, home directory, per-model
subdirectories), and the full registry client is implemented on stdlib
``urllib`` (gitlab.py:48-268: models.yaml list, per-filter file URLs,
thread-pool download, ``.lzma`` decompression) with the base URL
overridable via ``$NMMA_TPU_REGISTRY_URL`` — so air-gapped deployments
can point it at an internal mirror, and tests exercise it against a
localhost server. A pluggable hook can replace the HTTP path entirely
(read-only model bundles on TPU pods). In a multi-host job, only
process 0 fetches and the others wait on the filesystem (the
collective-free analogue of the reference's MPI barrier).
"""

from __future__ import annotations

import lzma
import os
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

MODELS_ENV = "NMMA_TPU_MODELS"
REGISTRY_URL_ENV = "NMMA_TPU_REGISTRY_URL"
# the reference's public registry (gitlab.py:19); raw/main mirrors its
# download URL layout
DEFAULT_REGISTRY_URL = "https://gitlab.com/Theodlz/nmma-models/raw/main"
# X-ray / radio "filters" are frequency points evaluated analytically,
# not registry artifacts (gitlab.py:25-32)
SKIP_FILTERS = (
    "X-ray-1keV", "X-ray-5keV", "radio-5.5GHz", "radio-1.25GHz",
    "radio-3GHz", "radio-6GHz",
)
_DOWNLOAD_HOOK = None


def get_models_home(models_home=None) -> str:
    """Model cache directory (reference get_models_home, gitlab.py:20-40)."""
    if models_home:
        return models_home
    return os.environ.get(
        MODELS_ENV, os.path.join(os.path.expanduser("~"), "nmma_tpu_models"))


def set_download_hook(fn):
    """fn(model_name, destination_dir) -> None; called for missing models."""
    global _DOWNLOAD_HOOK
    _DOWNLOAD_HOOK = fn


def get_model(model_name, models_home=None, filters=None,
              download_if_missing=True):
    """Resolve a surrogate model file, fetching via the hook if allowed.

    Returns the path to ``{model_name}.npz`` inside the models home.
    """
    home = get_models_home(models_home)
    path = os.path.join(home, f"{model_name}.npz")
    if os.path.exists(path):
        return path
    nested = os.path.join(home, model_name, f"{model_name}.npz")
    if os.path.exists(nested):
        return nested
    if download_if_missing and _DOWNLOAD_HOOK is not None:
        os.makedirs(home, exist_ok=True)
        if _is_process_zero():
            _DOWNLOAD_HOOK(model_name, home)
        else:
            _wait_for(path)
        if os.path.exists(path):
            return path
    raise FileNotFoundError(
        f"Surrogate model {model_name!r} not found under {home!r}. "
        f"Set ${MODELS_ENV} to a directory containing {model_name}.npz "
        "(train one with create-svdmodel, or mount the model bundle).")


def registry_url(base_url=None) -> str:
    """Registry base URL: explicit arg > $NMMA_TPU_REGISTRY_URL > public."""
    return (base_url or os.environ.get(REGISTRY_URL_ENV)
            or DEFAULT_REGISTRY_URL)


def _fetch(url, timeout=60.0):
    import urllib.request
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        expect = resp.headers.get("content-length")
        data = resp.read()
    if expect is not None and len(data) != int(expect):
        raise OSError(f"incomplete download from {url}: "
                      f"{len(data)} of {expect} bytes")
    return data


def download_file(url, dest, timeout=60.0):
    """Fetch ``url`` into ``dest`` atomically (tmp + rename).

    ``.lzma`` payloads are decompressed in flight, mirroring the
    reference's download_and_decompress (gitlab.py:76-92) without the
    external ``lzma`` binary.
    """
    data = _fetch(url, timeout=timeout)
    if url.endswith(".lzma"):
        data = lzma.decompress(data)
        if dest.endswith(".lzma"):
            dest = dest[:-5]
    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_name(dest.name + ".part")
    tmp.write_bytes(data)
    os.replace(tmp, dest)
    return str(dest)


def download_models_list(models_home=None, base_url=None, timeout=60.0):
    """Fetch ``models.yaml`` into the models home (gitlab.py:95-101)."""
    home = get_models_home(models_home)
    os.makedirs(home, exist_ok=True)
    return download_file(f"{registry_url(base_url)}/models.yaml",
                         os.path.join(home, "models.yaml"), timeout=timeout)


def load_models_list(models_home=None, base_url=None):
    """models.yaml dict merged with locally present model directories.

    Returns ``(models, used_local)`` exactly as the reference
    (gitlab.py:104-147): a missing/unfetchable models.yaml degrades to
    the local directory scan with ``used_local=True``.
    """
    import yaml
    home = get_models_home(models_home)
    models_file = Path(home, "models.yaml")
    models, used_local = {}, False
    try:
        if not models_file.exists():
            download_models_list(home, base_url=base_url)
        with models_file.open("r") as f:
            models = yaml.safe_load(f) or {}
    except Exception:
        used_local = True

    for sub in Path(home).glob("*"):
        if not sub.is_dir():
            continue
        name = sub.name
        filters = []
        for ff in sub.glob("*"):
            if not ff.is_file():
                continue
            stem = ff.stem
            if name in stem:
                stem = stem.replace(name, "")
            stem = stem.strip("_")
            if stem:
                filters.append(stem)
        filters = sorted(set(filters))
        entry = models.setdefault(name, {})
        entry["filters"] = sorted(set(filters + list(entry.get("filters",
                                                               []))))
    return models, used_local


def refresh_models_list(models_home=None, base_url=None):
    """Force a re-fetch of models.yaml (gitlab.py:150-161)."""
    home = get_models_home(models_home)
    stale = Path(home, "models.yaml")
    if stale.exists():
        stale.unlink()
    return load_models_list(home, base_url=base_url)[0]


def download_model(model_name, filters=None, models_home=None,
                   base_url=None, filters_only=False,
                   download_if_missing=True):
    """Resolve a reference-format model (joblib core + per-filter files).

    Mirrors the reference's ``get_model`` URL layout and semantics
    (gitlab.py:164-268): ``{base}/models/{core}.joblib`` plus
    ``{base}/models/{name}/{filter}.{joblib|h5}`` (``_tf`` models ship
    h5 per-filter weights), SKIP_FILTERS passed through untouched,
    thread-pool fetch of missing files on process 0 only. Returns
    ``(filepaths, filters)``.
    """
    home = get_models_home(models_home)
    os.makedirs(home, exist_ok=True)
    models, used_local = load_models_list(home, base_url=base_url)
    if model_name not in models:
        raise ValueError(f"model_name {model_name} not found in models list"
                         + (" (local scan only — registry unreachable)"
                            if used_local else ""))
    info = models[model_name]
    os.makedirs(os.path.join(home, model_name), exist_ok=True)

    known = list(info.get("filters", []))
    # the registry stores underscore filter names (ps1__g); colon-form
    # requests (ps1::g) are accepted AND mapped back so URLs/filepaths
    # use the registry's spelling — validating the synonym but building
    # a colon URL 404s every such filter
    to_registry = {f.replace("_", ":"): f for f in known}
    all_filters = set(known) | set(to_registry)
    if not filters:
        filters = known
    skipped = [f for f in filters if f in SKIP_FILTERS]
    filters = [to_registry.get(f, f) for f in filters
               if f not in SKIP_FILTERS]
    missing_filters = sorted(set(filters) - all_filters)
    if missing_filters:
        where = "local models list" if used_local else "registry models list"
        raise ValueError(f"{where} does not have filters "
                         f"{','.join(missing_filters)} for {model_name}")

    filter_format = "h5" if "_tf" in model_name else "joblib"
    core_name = "_".join(c for c in model_name.split("_") if c != "tf")

    base = registry_url(base_url)
    filepaths = ([] if filters_only else
                 [Path(home, f"{core_name}.joblib")])
    urls = ([] if filters_only else
            [f"{base}/models/{core_name}.joblib"])
    filepaths += [Path(home, model_name, f"{f}.{filter_format}")
                  for f in filters]
    urls += [f"{base}/models/{model_name}/{f}.{filter_format}"
             for f in filters]

    missing = [(u, str(f)) for u, f in zip(urls, filepaths)
               if not f.exists()]
    if missing:
        if not download_if_missing:
            raise OSError("Data not found and `download_if_missing` is "
                          "False")
        if _is_process_zero():
            with ThreadPoolExecutor(
                    max_workers=min(len(missing), 8)) as pool:
                list(pool.map(lambda uf: download_file(*uf), missing))
        else:
            for _, f in missing:
                _wait_for(f)
        still = [f for _, f in missing if not os.path.exists(f)]
        if still:
            raise OSError(f"failed to download {len(still)} model file(s) "
                          f"for {model_name}: " + ", ".join(still[:3]))
    return [str(f) for f in filepaths], filters + skipped


def _is_process_zero() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def _wait_for(path, timeout=600.0, poll=2.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(path):
            return
        time.sleep(poll)


def load_registered_model(model_name, models_home=None, mag_ncoeff=None):
    """get_model + SVDModelData load + source registration in one call."""
    from .models.svd import SVDModelData, make_svd_source_model
    path = get_model(model_name, models_home)
    svd = SVDModelData.load(path)
    return make_svd_source_model(model_name, svd, mag_ncoeff=mag_ncoeff)


def load_reference_registry_model(model_name, filters=None, models_home=None,
                                  base_url=None, mag_ncoeff=None):
    """Download a reference-format model and register it as a source model.

    The registry fetch (``download_model``) plus the joblib/h5 ingestion
    in one call — the counterpart of the reference passing
    ``local_only=False`` SVD paths through ``em/training.py`` load. The
    ``_tf`` suffix is stripped for the registered model name, matching
    the reference's core-name convention (gitlab.py:219-223).
    """
    from .models.svd import ingest_nmma_svd_model, make_svd_source_model
    _, filts = download_model(model_name, filters=filters,
                              models_home=models_home, base_url=base_url)
    home = get_models_home(models_home)
    core_name = "_".join(c for c in model_name.split("_") if c != "tf")
    svd = ingest_nmma_svd_model(
        home, core_name,
        filters=[f for f in filts if f not in SKIP_FILTERS],
        filter_dir=os.path.join(home, model_name))
    return make_svd_source_model(core_name, svd, mag_ncoeff=mag_ncoeff)
