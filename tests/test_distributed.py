"""Multi-process distributed initialization (VERDICT r2 next-round #4).

Executes ``initialize_distributed`` for real in a 2-process localhost
cluster (CPU backend, 4 virtual devices per process -> one 8-device
global mesh) and verifies a cross-process collective through the shared
GSPMD path. This is the DCN-analogue smoke test the round-2 wiring never
ran."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from nmma_tpu.parallel import initialize_distributed, make_mesh

    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    initialize_distributed(coordinator_address=f'127.0.0.1:{{port}}',
                           num_processes=2, process_id=proc_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()

    mesh = make_mesh()
    sharding = NamedSharding(mesh, P('batch'))
    full = np.arange(8.0, dtype=np.float32)
    arr = jax.make_array_from_callback(
        (8,), sharding, lambda idx: full[idx])

    @jax.jit
    def total(x):
        return jnp.sum(x)          # cross-process all-reduce under GSPMD

    out = float(total(arr))
    assert out == 28.0, out
    # second collective: weighted reduction like the sampler's threshold
    @jax.jit
    def weighted(x):
        return jnp.max(x * 2.0) + jnp.min(x)

    assert float(weighted(arr)) == 14.0
    print(f'proc {{proc_id}}: distributed ok, total={{out}}')
""").format(repo=REPO)


def test_two_process_localhost_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append("--xla_force_host_platform_device_count=4")
    env["XLA_FLAGS"] = " ".join(flags)

    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for i, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.fail(f"process {i} timed out")
        outs.append((proc.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, (f"process {i} rc={rc}\nstdout:{out}\n"
                         f"stderr tail:{err[-2000:]}")
        assert "distributed ok, total=28.0" in out
