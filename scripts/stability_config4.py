"""Posterior stability vs NS resolution for BASELINE config 4 (VERDICT
r4 #8): rerun the parity config-4 joint KN+GRB analysis (GRB211211A,
10 free params) at production nlive=1024/walks=32 and report the
per-parameter JS divergence against the nlive=512 parity run, plus the
wall-clock cost of the resolution step. Config 3's version of this
table lives in artifacts/diag_config3.json (nlive 512 vs 2048).

Run on the TPU (after parity_cross_sampler45.py 4 has produced
outdir_grb211211a/parity_config4_posterior_samples.csv):
    python scripts/stability_config4.py
Writes artifacts/stability_config4.json.
"""

import importlib.util
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "stability_config4.json")
BASE_CSV = os.path.join(REPO, "outdir_grb211211a",
                        "parity_config4_posterior_samples.csv")


def load_csv_posterior(path):
    arr = np.genfromtxt(path, delimiter=",", names=True)
    return {k: np.asarray(arr[k]) for k in arr.dtype.names}


def main():
    spec = importlib.util.spec_from_file_location(
        "p45", os.path.join(REPO, "scripts", "parity_cross_sampler45.py"))
    p45 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(p45)

    from nmma_tpu.inference import NestedSamplerConfig
    from nmma_tpu.post_processing.parity import posterior_js_divergences

    base = load_csv_posterior(BASE_CSV)

    ana = p45._config4()
    ana.config.label = "parity_config4_n1024"
    ana.config.sampler = NestedSamplerConfig(
        nlive=1024, n_delete=128, walks=32, dlogz=0.3, chunk_size=5)
    t0 = time.time()
    ana.run(verbose=True, checkpoint=False)
    wall = time.time() - t0
    post = ana.posterior_samples(rng=np.random.default_rng(0))

    sampled = [k for k in post
               if k != "log_likelihood" and k in base
               and np.std(post[k]) > 0 and np.std(base[k]) > 0]
    js = posterior_js_divergences(
        {k: np.asarray(post[k]) for k in sampled},
        {k: np.asarray(base[k]) for k in sampled}, sampled)
    report = {
        "config": 4,
        "nlive_base": 512, "nlive_hi": 1024,
        "wall_s_hi": round(wall, 1),
        "logz_hi": round(float(ana.result.logz), 2),
        "js_512_vs_1024": {k: round(float(v), 5) for k, v in js.items()},
        "js_max": round(float(max(js.values())), 5),
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
