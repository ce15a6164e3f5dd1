"""Convert the reference's packaged ZTF observing-strategy artifacts
(sklearn-1.0-era KernelDensity joblibs + pandas pickles,
``nmma/em/data/``) into one version-proof npz of plain arrays.

The KDEs are Gaussian with a scalar bandwidth, so their training points +
bandwidth fully specify them (sampling = random training point + N(0, bw)
noise); the sampling/uncertainty tables become flat arrays. Output:
``nmma_tpu/data/ztf_observing.npz`` consumed by
``nmma_tpu.strategies.ZTFObservingModel``.
"""

import os
import sys
import warnings

import numpy as np
import pandas as pd

warnings.filterwarnings("ignore")

# compat shims for the 2021-era pickles
import sklearn.metrics._dist_metrics as _dm

_dm.EuclideanDistance = _dm.EuclideanDistance64

import joblib  # noqa: E402

SRC = "/root/reference/nmma/em/data"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "nmma_tpu", "data", "ztf_observing.npz")


def kde_arrays(name):
    kde = joblib.load(os.path.join(SRC, name))
    pts = np.asarray(kde.tree_.data, dtype=np.float64).ravel()
    return pts, float(kde.bandwidth)


def main():
    payload = {}
    for tag, fname in [
        ("revisit", "ZTF_revisit_kde_public.joblib"),
        ("revisit_i", "ZTF_revisit_kde_i.joblib"),
        ("lim_g", "lims_public_g.joblib"),
        ("lim_r", "lims_public_r.joblib"),
        ("lim_i", "lims_i.joblib"),
        ("lim_too180_g", "lims_ToO_180_g.joblib"),
        ("lim_too180_r", "lims_ToO_180_r.joblib"),
        ("lim_too300_g", "lims_ToO_300_g.joblib"),
        ("lim_too300_r", "lims_ToO_300_r.joblib"),
    ]:
        pts, bw = kde_arrays(fname)
        payload[f"{tag}_points"] = pts
        payload[f"{tag}_bandwidth"] = bw

    def ragged(df, prefix):
        """Rows are whole observing *nights* (arrays of intra-night
        offsets + band codes): flatten with row-offset indexing."""
        t_flat, b_flat, offsets = [], [], [0]
        for t_row, b_row in zip(df["t"], df["bands"]):
            t_flat.extend(np.atleast_1d(t_row).astype(float))
            b_flat.extend(np.atleast_1d(b_row).astype(int))
            offsets.append(len(t_flat))
        payload[f"{prefix}_t"] = np.asarray(t_flat, dtype=np.float64)
        payload[f"{prefix}_band"] = np.asarray(b_flat, dtype=np.int8)
        payload[f"{prefix}_offsets"] = np.asarray(offsets, dtype=np.int64)

    ragged(pd.read_pickle(os.path.join(SRC, "ZTF_sampling_public.pkl")),
           "sampling")
    for too in ("180", "300"):
        ragged(pd.read_pickle(os.path.join(SRC, f"sampling_ToO_{too}.pkl")),
               f"sampling_too{too}")

    unc = pd.read_pickle(os.path.join(SRC, "ZTF_uncer_params.pkl"))
    payload["uncer_band"] = unc["band"].to_numpy(dtype=np.int8)
    payload["uncer_left"] = np.asarray(
        [iv.left for iv in unc["interval"]], dtype=np.float64)
    payload["uncer_right"] = np.asarray(
        [iv.right for iv in unc["interval"]], dtype=np.float64)
    payload["uncer_a"] = unc["a"].to_numpy(dtype=np.float64)
    payload["uncer_loc"] = unc["loc"].to_numpy(dtype=np.float64)
    payload["uncer_scale"] = unc["scale"].to_numpy(dtype=np.float64)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **payload)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1024:.0f} KB)")


if __name__ == "__main__":
    main()
