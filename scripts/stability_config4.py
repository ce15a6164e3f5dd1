"""Posterior stability vs NS resolution for BASELINE config 4 (VERDICT
r4 #8): compare the archived nlive=512 run of the parity config-4 joint
KN+GRB analysis (GRB211211A, 11 free params) against the production
nlive=1024 parity re-run, and additionally run an INDEPENDENT
nlive=1024/walks=32 NS at a fresh seed to separate resolution drift
from seed scatter at production settings. Config 3's version of this
table lives in artifacts/diag_config3.json (nlive 512 vs 2048).

Run on the TPU (after parity_cross_sampler45.py 4 has produced the
nlive=1024 outdir_grb211211a/parity_config4_posterior_samples.csv; the
nlive=512 snapshot is parity_config4_n512_posterior_samples.csv):
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
CSV_512 = os.path.join(REPO, "outdir_grb211211a",
                       "parity_config4_n512_posterior_samples.csv")
CSV_1024 = os.path.join(REPO, "outdir_grb211211a",
                        "parity_config4_posterior_samples.csv")


def load_csv_posterior(path):
    arr = np.genfromtxt(path, delimiter=",", names=True)
    return {k: np.asarray(arr[k]) for k in arr.dtype.names}


def _js(a, b):
    from nmma_tpu.post_processing.parity import posterior_js_divergences
    sampled = [k for k in a
               if k != "log_likelihood" and k in b
               and np.std(a[k]) > 0 and np.std(b[k]) > 0]
    return posterior_js_divergences(
        {k: np.asarray(a[k]) for k in sampled},
        {k: np.asarray(b[k]) for k in sampled}, sampled)


def main():
    spec = importlib.util.spec_from_file_location(
        "p45", os.path.join(REPO, "scripts", "parity_cross_sampler45.py"))
    p45 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(p45)

    from nmma_tpu.inference import NestedSamplerConfig

    base_512 = load_csv_posterior(CSV_512)
    run_1024 = load_csv_posterior(CSV_1024)

    # independent production-settings run: fresh seed AND walks=32 (the
    # parity re-run used walks=16), so agreement here bounds both seed
    # scatter and walk-length sensitivity at nlive=1024
    ana = p45._config4()
    ana.config.label = "parity_config4_n1024b"
    ana.config.sampler = NestedSamplerConfig(
        nlive=1024, n_delete=128, walks=32, dlogz=0.3, chunk_size=5,
        seed=ana.config.sampler.seed + 7)
    t0 = time.time()
    ana.run(verbose=True, checkpoint=False)
    wall = time.time() - t0
    post_b = ana.posterior_samples(rng=np.random.default_rng(0))

    js_res = _js(base_512, run_1024)
    js_seed = _js(run_1024, post_b)
    report = {
        "config": 4,
        "js_512_vs_1024": {k: round(float(v), 5) for k, v in js_res.items()},
        "js_max_512_vs_1024": round(float(max(js_res.values())), 5),
        "js_1024_seeds_walks": {k: round(float(v), 5)
                                for k, v in js_seed.items()},
        "js_max_1024_seeds_walks": round(float(max(js_seed.values())), 5),
        "wall_s_1024_w32": round(wall, 1),
        "logz_1024_w32": round(float(ana.result.logz), 2),
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
