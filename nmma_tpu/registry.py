"""Surrogate-model registry: local model home + download hooks.

Counterpart of ``nmma/core/gitlab.py``: the reference resolves surrogate
artifacts from ``$NMMA_MODELS`` / ``~/nmma_models`` and downloads missing
ones from a GitLab registry (rank-0 with an MPI barrier). Here the local
resolution logic is identical (env var, home directory, per-model
subdirectories); remote fetching goes through a pluggable hook so
air-gapped TPU pods can mount a read-only model bundle instead — in a
multi-host job, only process 0 fetches and the others wait on the
filesystem (the collective-free analogue of the reference's barrier).
"""

from __future__ import annotations

import os
import time

MODELS_ENV = "NMMA_TPU_MODELS"
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
