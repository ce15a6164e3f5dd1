"""Mosaic (Pallas-TPU) toolchain health probe with a persisted verdict.

Why this exists (VERDICT r4 #3): the Me2017 hot path defaults to a
Pallas kernel on TPU (``models/kilonova.py``). The remote TPU service's
FIRST Mosaic compile in a degraded service window has been observed to
take minutes (BENCH_r04: an eager probe exceeded its 240 s deadline,
warmup 41 s), and the persistent XLA compile cache does not demonstrably
retain Mosaic executables across processes — so a production user could
stall for minutes inside their first likelihood compile with no
indication why. The fix: before the production dispatch ever chooses the
Pallas branch, compile a tiny *jitted* Pallas kernel in a SUBPROCESS
under a deadline, and persist the verdict on disk keyed by the
toolchain fingerprint (jax/jaxlib versions + PJRT platform_version,
which changes on every service upgrade). Healthy toolchains pay the
probe once (~15 s process startup + ~2 s compile); a wedged toolchain
costs one bounded timeout and every subsequent process falls straight
back to the XLA associative-scan form (within ~10-20% of the kernel's
throughput) until the fingerprint changes or the negative verdict's TTL
expires.

Environment knobs:
  NMMA_TPU_DISABLE_PALLAS=1      never use Pallas (no probe)
  NMMA_TPU_FORCE_PALLAS=1        always use Pallas (no probe)
  NMMA_TPU_PALLAS_PROBE_TIMEOUT  probe deadline in seconds (default 120)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_NEGATIVE_TTL_S = 24 * 3600.0    # retry a failed toolchain daily
_MEMO: dict[str, bool] = {}


def _cache_path():
    return os.path.join(os.path.expanduser("~"), ".cache", "nmma_tpu",
                        "pallas_probe.json")


def toolchain_fingerprint() -> str:
    """Identify the compile toolchain; changes on service upgrades."""
    import jax
    import jaxlib
    try:
        dev = jax.devices()[0]
        platform = getattr(dev.client, "platform_version", dev.platform)
    except Exception:  # pragma: no cover - no device
        platform = "none"
    return f"jax={jax.__version__};jaxlib={jaxlib.__version__};" \
           f"platform={platform}".replace("\n", " ")


def _load_cache() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _store_verdict(fingerprint: str, ok: bool, note: str):
    path = _cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cache = _load_cache()
    cache[fingerprint] = {"ok": ok, "ts": time.time(), "note": note}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=2)
    os.replace(tmp, path)


_PROBE_CODE = """\
import sys
sys.path.insert(0, {repo!r})
import numpy as np, jax, jax.numpy as jnp
from nmma_tpu.ops.pallas_me2017 import me2017_dynamics_pallas
t = jnp.asarray(np.geomspace(0.01, 14.0, 32), jnp.float32)
b = jnp.full((8,), -1.5, jnp.float32)
# jit: production embeds the kernel in a jitted likelihood; the eager
# pallas_call path compiles differently (and far slower through the
# remote transport), so probe what production runs
out = jax.jit(me2017_dynamics_pallas)(b, b + 0.5, b + 4.5, b + 4.66, t)
jax.block_until_ready(out)
print('ok')
"""


def probe_mosaic(timeout: float | None = None) -> tuple[bool, str]:
    """Compile + run the tiny jitted Me2017 Pallas kernel in a
    subprocess under a deadline. Returns (ok, note)."""
    if timeout is None:
        timeout = float(os.environ.get("NMMA_TPU_PALLAS_PROBE_TIMEOUT",
                                       120.0))
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    code = _PROBE_CODE.format(repo=repo)
    try:
        t0 = time.perf_counter()
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout)
        dt = time.perf_counter() - t0
        if r.returncode == 0 and "ok" in r.stdout:
            return True, f"probe compiled in {dt:.0f}s"
        tail = (r.stderr or "").strip().splitlines()
        return False, f"probe rc={r.returncode}: " + \
            (tail[-1][:200] if tail else "no stderr")
    except subprocess.TimeoutExpired:
        return False, f"probe exceeded {timeout:.0f}s"


def use_pallas_me2017() -> bool:
    """Trace-time decision for the Me2017 batched dispatch.

    Env overrides first; then the per-toolchain cached verdict; on a
    cache miss run the bounded probe once and persist. Memoized
    in-process so a likelihood retrace never re-probes.
    """
    if os.environ.get("NMMA_TPU_DISABLE_PALLAS"):
        return False
    if os.environ.get("NMMA_TPU_FORCE_PALLAS"):
        return True
    fp = toolchain_fingerprint()
    if fp in _MEMO:
        return _MEMO[fp]
    entry = _load_cache().get(fp)
    if entry is not None:
        ok = bool(entry.get("ok"))
        if ok or time.time() - float(entry.get("ts", 0)) < _NEGATIVE_TTL_S:
            _MEMO[fp] = ok
            return ok
    ok, note = probe_mosaic()
    _store_verdict(fp, ok, note)
    if not ok:
        print(f"nmma_tpu: Mosaic toolchain probe failed ({note}) — "
              f"falling back to the XLA Me2017 path for 24h "
              f"(NMMA_TPU_FORCE_PALLAS=1 overrides)", flush=True)
    _MEMO[fp] = ok
    return ok
