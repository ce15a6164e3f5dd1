"""BASELINE config-5 wall-clock benchmark: joint GW+EM+EOS BNS inference
through the public two-stage CLI (nmma-generation / nmma-analysis).

Run on the attached TPU:  python scripts/bench_joint_pe.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MACRO_DIR = "/root/reference/nmma/tests/data/eos_macro"


def _write_inputs(outdir):
    from nmma_tpu.injections import write_injection_file
    inj = os.path.join(outdir, "inj.json")
    write_injection_file(inj, {
        "chirp_mass": [1.1977], "mass_ratio": [0.9],
        "luminosity_distance": [40.0], "EOS": [4.2], "ratio_zeta": [0.3],
        "alpha": [5e-5], "theta_jn": [0.4], "phase": [1.3], "psi": [1.5],
        "ra": [3.446], "dec": [-0.408], "geocent_time": [0.0],
        "timeshift": [0.0]})
    prior = os.path.join(outdir, "p.prior")
    with open(prior, "w") as fh:
        fh.write(
            "chirp_mass = Uniform(minimum=1.18, maximum=1.21)\n"
            "mass_ratio = Uniform(minimum=0.6, maximum=1.0)\n"
            "luminosity_distance = Uniform(minimum=10., maximum=100.)\n"
            "EOS = Uniform(minimum=0., maximum=10.)\n"
            "ratio_zeta = Uniform(minimum=0., maximum=0.5)\n"
            "alpha = 5e-5\ntheta_jn = 0.4\nphase = 1.3\n"
            "psi = 1.5\nra = 3.446\ndec = -0.408\ngeocent_time = 0.0\n"
            "timeshift = 0.0\n")
    return inj, prior


def _gen_args(outdir, label, inj, prior):
    return ["--outdir", outdir, "--label", label,
            "--prior-file", prior, "--injection-file", inj,
            "--eos-data", MACRO_DIR, "--duration", "64.0",
            "--minimum-frequency", "25.0", "--maximum-frequency", "1024.0",
            "--gw-detectors", "H1,L1,V1",
            "--waveform", "IMRPhenomD_NRTidalv2",
            "--em-model", "Bu2019lm_sparse",
            "--svd-path", os.path.join(REPO, "artifacts",
                                       "Bu2019lm_sparse_svd.npz")]


def main():
    import subprocess

    from nmma_tpu.cli.joint_main import nmma_analysis, nmma_generation

    outdir = tempfile.mkdtemp(prefix="bench_joint_")
    inj, prior = _write_inputs(outdir)
    t0 = time.time()
    dump = nmma_generation(_gen_args(outdir, "cfg5", inj, prior))
    t_gen = time.time() - t0
    # warm-cache generation (round-3 criterion: <= 30 s): a FRESH process
    # with the persistent XLA compile cache now populated by the run
    # above — the state every re-run of the same analysis sees
    t0 = time.time()
    code = (f"import sys; sys.path.insert(0, {REPO!r});"
            f"from nmma_tpu.cli.joint_main import nmma_generation;"
            f"nmma_generation({_gen_args(outdir, 'cfg5w', inj, prior)!r})")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800)
    t_gen_warm = time.time() - t0 if r.returncode == 0 else None
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-1500:])
    t0 = time.time()
    nmma_analysis(["--data-dump", dump, "--outdir", outdir,
                   "--label", "cfg5", "--nlive", "1024", "--walks", "16",
                   "--dlogz", "0.1"])
    t_samp = time.time() - t0
    z = np.load(os.path.join(outdir, "cfg5_result.npz"))
    print(json.dumps({
        "config": 5, "generation_s": round(t_gen, 1),
        "generation_warm_s": round(t_gen_warm, 1)
        if t_gen_warm is not None else None,
        "sampling_s": round(t_samp, 1),
        "logz": round(float(z["logz"]), 2),
        "logz_err": round(float(z["logz_err"]), 3),
        "ncall": int(z["ncall"]) if "ncall" in z.files else None,
        "mc_median": float(np.median(z["posterior_chirp_mass"]))
        if "posterior_chirp_mass" in z.files else None,
    }))


if __name__ == "__main__":
    main()
