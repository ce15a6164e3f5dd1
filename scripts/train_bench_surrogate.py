"""Train the Bu2019lm-family benchmark surrogate from the bundled bulla
grid (BASELINE config 2 analogue; the full Bu2019lm grid is a download
the zero-egress environment gates, so the shipped sparse training grid
`/root/reference/nmma/tests/data/bulla/` is the offline stand-in).

Writes artifacts/Bu2019lm_sparse_svd.npz consumed by bench.py.
"""

import glob
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nmma_tpu.training import (SVDTrainingConfig, read_bulla_grid,  # noqa: E402
                               train_svd_model)

files = glob.glob("/root/reference/nmma/tests/data/bulla/*.dat")
entries, pnames, filters = read_bulla_grid(files, model="Bu2019lm_sparse")
svd = train_svd_model(
    entries, pnames, filters,
    SVDTrainingConfig(n_coeff=10, hidden=128, n_epochs=6000, tmin=0.2,
                      n_tsteps=100),
    verbose=True)
out = os.path.join(REPO, "artifacts", "Bu2019lm_sparse_svd.npz")
svd.save(out)
print(f"saved {out}")
