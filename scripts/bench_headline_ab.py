"""A/B the headline-bench lowering choices on the attached TPU.

Run:  python scripts/bench_headline_ab.py

Times the production-shaped Bu2019lm likelihood batch (bench.py's
headline) across {SVD eval: batched|rankc} x {EM contract: einsum|fused}
in fresh subprocesses (clean trace + env per cell), best-of-5 each, and
prints a table. The winner becomes bench.py's default; losers stay
selectable via NMMA_TPU_SVD_EVAL / NMMA_TPU_EM_CONTRACT.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CODE = """
import os, sys, time
import numpy as np
sys.path.insert(0, __REPO__)
import jax, jax.numpy as jnp
import bench
ana, svd = bench.build_svd_analysis()
rate, sample, warmup = bench.bench_tpu_rate(ana)
fin = float((sample > -1e29).mean())
print(f"RESULT svd={os.environ.get('NMMA_TPU_SVD_EVAL','auto')} "
      f"em={os.environ.get('NMMA_TPU_EM_CONTRACT','einsum')} "
      f"pallas={not os.environ.get('NMMA_TPU_DISABLE_PALLAS')} "
      f"rate={rate:.0f} evals/s warmup={warmup:.1f}s finite={fin:.3f}",
      flush=True)
"""

# (svd eval, em contract, pallas svd kernel); the first row is the
# round-3 shipped configuration
CELLS = [
    ("batched", "einsum", False),
    ("rankc", "einsum", False),
    ("rankc", "fused", False),
    ("rankc", "einsum", True),
    ("rankc", "fused", True),
]


def main():
    results = []
    for svd_mode, em_mode, pallas in CELLS:
        env = dict(os.environ)
        env["NMMA_TPU_SVD_EVAL"] = svd_mode
        env["NMMA_TPU_EM_CONTRACT"] = em_mode
        if pallas:
            env.pop("NMMA_TPU_DISABLE_PALLAS", None)
            env["NMMA_TPU_SVD_PALLAS"] = "1"   # kernel is opt-in
        else:
            env["NMMA_TPU_DISABLE_PALLAS"] = "1"
            env.pop("NMMA_TPU_SVD_PALLAS", None)
        print(f"--- svd={svd_mode} em={em_mode} pallas={pallas}",
              flush=True)
        r = subprocess.run(
            [sys.executable, "-u", "-c", CODE.replace("__REPO__", repr(REPO))],
            env=env, capture_output=True, text=True, timeout=1800)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-1500:])
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                results.append(line)
    print("\n".join(["=== summary ==="] + results), flush=True)


if __name__ == "__main__":
    main()
