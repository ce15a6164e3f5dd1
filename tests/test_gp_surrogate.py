"""GP-backend SVD surrogate (sklearn-GP training-path parity)."""

import glob

import jax.numpy as jnp
import numpy as np


def test_gp_surrogate_accuracy():
    from nmma_tpu.ops.interp import masked_interp_linear
    from nmma_tpu.training import SVDTrainingConfig, read_bulla_grid
    from nmma_tpu.training.gp import (svd_gp_surrogate_mags,
                                      train_svd_gp_model)
    files = glob.glob("/root/reference/nmma/tests/data/bulla/*.dat")
    entries, pnames, _ = read_bulla_grid(files, model="Bu2019lm_sparse")
    filters = ["ztfg", "ztfr"]
    meta, gp = train_svd_gp_model(
        entries, pnames, filters,
        config=SVDTrainingConfig(n_coeff=8, tmin=0.2, n_tsteps=60),
        n_steps=500, verbose=False)

    tt = meta["tt"]
    errs = []
    for e in entries:
        pred = np.asarray(svd_gp_surrogate_mags(meta, gp, e["params"],
                                                jnp.asarray(tt)))
        for j, f in enumerate(filters):
            truth = np.asarray(masked_interp_linear(
                tt, e["t"], e["mags"][f], fill_value=np.nan))
            sel = np.isfinite(truth) & np.isfinite(pred[j])
            errs.append(np.abs(pred[j][sel] - truth[sel]))
    errs = np.concatenate(errs)
    assert np.median(errs) < 0.1
    assert np.percentile(errs, 95) < 0.5
