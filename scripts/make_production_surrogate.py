"""Build the production-shaped Bu2019lm benchmark surrogate.

Round-2 VERDICT "What's weak" #1: the headline benchmark used a toy
2-parameter / hidden-128 surrogate, flattering the CPU per-theta baseline.
The reference's production Bu2019lm is 4 parameters with a Dense(2048)
per-filter MLP projecting to n_coeff=10 SVD coefficients
(/root/reference/nmma/em/training.py:336-397; model parameters
/root/reference/nmma/em/model_parameters.py Bu2019lm row: mej_dyn,
mej_wind, KNphi, KNtheta).

This script constructs an artifact with exactly those dimensions — 9
filters x Dense(4 -> 2048 -> 10) — by embedding the *trained* sparse
surrogate (real SVD bases + trained 2-param MLP from
scripts/train_bench_surrogate.py) into the production-sized network:

  W1[:, :2, :128] = trained W1, everything else small random;
  W2[:, :128, :]  = trained W2, remaining 1920 hidden rows small random.

The network output therefore stays a physical Bu2019lm-family light curve
(plus a small perturbation carrying genuine dependence on all 4 params),
while the *compute* — what the benchmark measures — is exactly the
production shape. Weight values do not affect throughput (VERDICT
next-round #1: "random weights are fine").
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARSE = os.path.join(REPO, "artifacts", "Bu2019lm_sparse_svd.npz")
OUT = os.path.join(REPO, "artifacts", "Bu2019lm_production_svd.npz")

HIDDEN = 2048
PARAMS = ["log10_mej_dyn", "log10_mej_wind", "KNphi", "KNtheta"]
PARAM_MINS_EXTRA = [15.0, 0.0]     # KNphi [deg], KNtheta [deg]
PARAM_MAXS_EXTRA = [75.0, 90.0]


def main():
    z = np.load(SPARSE)
    f, p_sparse, h_sparse = z["w1"].shape
    c = z["w2"].shape[-1]
    assert p_sparse == 2 and c == 10

    rng = np.random.default_rng(2019)
    p = len(PARAMS)

    w1 = rng.normal(0.0, 0.02, (f, p, HIDDEN)).astype(np.float32)
    b1 = rng.normal(0.0, 0.02, (f, HIDDEN)).astype(np.float32)
    w2 = rng.normal(0.0, 2e-4, (f, HIDDEN, c)).astype(np.float32)
    b2 = np.asarray(z["b2"], dtype=np.float32)

    w1[:, :2, :h_sparse] = z["w1"]
    b1[:, :h_sparse] = z["b1"]
    w2[:, :h_sparse, :] = z["w2"]

    np.savez_compressed(
        OUT,
        tt=z["tt"], va=z["va"], mins=z["mins"], maxs=z["maxs"],
        param_mins=np.concatenate([z["param_mins"],
                                   np.asarray(PARAM_MINS_EXTRA)]),
        param_maxs=np.concatenate([z["param_maxs"],
                                   np.asarray(PARAM_MAXS_EXTRA)]),
        w1=w1, b1=b1, w2=w2, b2=b2,
        filters=z["filters"], parameter_names=np.asarray(PARAMS))
    print(f"wrote {OUT}: F={f} P={p} H={HIDDEN} C={c} "
          f"T={len(z['tt'])}")


if __name__ == "__main__":
    main()
