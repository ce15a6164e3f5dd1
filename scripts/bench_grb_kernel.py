"""GRB EATS kernel micro-benchmark: XLA hat-contraction vs Pallas kernel.

Run on the attached TPU:  python scripts/bench_grb_kernel.py [B]

Times the full batched GRB flux kernel (trumpet default) both ways and
checks on-device parity. Timing is best-of-N (the tunnel's throughput
varies ~2x run-to-run; see BENCHMARKS.md).
"""

import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_mode(mode, batch):
    """Run one timing in a subprocess (clean Pallas/XLA env per mode)."""
    code = f"""
import os, sys, time
import numpy as np
if "{mode}" == "xla":
    os.environ["NMMA_TPU_DISABLE_PALLAS"] = "1"
else:
    os.environ["NMMA_TPU_GRB_PALLAS"] = "1"   # kernel is opt-in
import jax, jax.numpy as jnp
sys.path.insert(0, {REPO!r})
from nmma_tpu.models import grb

B = {batch}
rng = np.random.default_rng(0)
t_obs = np.geomspace(0.1, 300.0, 64)
nu = np.array([1.4e14, 2.4e17])
params = {{
    "log10_E0": jnp.asarray(rng.uniform(51, 54, B)),
    "thetaCore": jnp.asarray(rng.uniform(0.02, 0.3, B)),
    "thetaWing": jnp.asarray(rng.uniform(0.35, 0.7, B)),
    "inclination_EM": jnp.asarray(rng.uniform(0.0, 0.6, B)),
    "log10_n0": jnp.asarray(rng.uniform(-4, 0, B)),
    "p": jnp.asarray(rng.uniform(2.1, 2.8, B)),
    "log10_epsilon_e": jnp.asarray(rng.uniform(-2, -0.5, B)),
    "log10_epsilon_B": jnp.asarray(rng.uniform(-4, -1, B)),
    "luminosity_distance": jnp.asarray(rng.uniform(30, 300, B)),
}}
fn = jax.jit(lambda ps: jax.vmap(
    lambda p: grb.grb_afterglow_flux_density(t_obs, nu, p))(ps))
t0 = time.time()
out = fn(params)
np.asarray(out)     # fetch = the only reliable sync on the axon tunnel
print(f"  compile+first: {{time.time()-t0:.1f}}s", flush=True)
# identical re-dispatches are served from a result cache in the remote
# path, so each timed rep queues K dispatches with distinct inputs and
# fetches the last output (fetch drains the queue)
K = 4
perturbed = [
    {{k: v + 1e-6 * (rep * K + j + 1) for k, v in params.items()}}
    for rep in range(8) for j in range(K)
]
best = 1e9
for rep in range(8):
    batch_inputs = perturbed[rep * K:(rep + 1) * K]
    t0 = time.time()
    outs = [fn(ps) for ps in batch_inputs]
    np.asarray(outs[-1])
    best = min(best, (time.time() - t0) / K)
arr = np.asarray(out)
np.save("/tmp/grb_bench_{mode}.npy", arr)
print(f"RESULT {mode} best_ms={{best*1e3:.1f}} evals_s={{B/best:.0f}} "
      f"finite={{np.isfinite(arr).mean():.4f}}", flush=True)
"""
    r = subprocess.run([sys.executable, "-u", "-c", code],
                       capture_output=True, text=True, timeout=1200)
    sys.stdout.write(r.stdout)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-2000:])
    return r.returncode == 0


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print(f"GRB kernel micro-bench, B={batch}")
    ok_x = run_mode("xla", batch)
    ok_p = run_mode("pallas", batch)
    if ok_x and ok_p:
        a = np.load("/tmp/grb_bench_xla.npy")
        b = np.load("/tmp/grb_bench_pallas.npy")
        scale = np.abs(a).max()
        rel = (np.abs(a - b) / np.maximum(np.abs(a), 1e-6 * scale)).max()
        print(f"parity: max rel diff = {rel:.2e}")
