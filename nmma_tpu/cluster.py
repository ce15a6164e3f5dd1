"""Cluster job generation: Slurm/TPU-pod scripts + multi-config runs.

Counterpart of ``nmma/em/cluster_handling.py``: the reference emits sbatch
scripts wrapping ``mpiexec -n N lightcurve-analysis`` (CPU/MPI farming);
the TPU equivalent is one process per job owning a chip/slice — no
mpiexec — so the generated script requests TPU resources and runs the CLI
directly. ``multi_config_analysis`` mirrors the yaml-of-runs driver
(reference :116-164) with serial or thread-parallel subprocess execution.
"""

from __future__ import annotations

import os
import subprocess
from concurrent.futures import ThreadPoolExecutor

SLURM_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={job_name}
#SBATCH --output={outdir}/{job_name}_%a.out
#SBATCH --error={outdir}/{job_name}_%a.err
#SBATCH --time={walltime}
#SBATCH --nodes=1
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task={cpus}
{tpu_directive}{array_directive}
{extra_lines}
{command}
"""


def slurm_analysis_script(args_string, outdir="outdir", job_name="nmma_tpu",
                          walltime="01:00:00", cpus=4, tpu_type=None,
                          n_array=None, extra_lines=(), script_name=None,
                          executable="lightcurve-analysis"):
    """Write an sbatch script for a (possibly arrayed) analysis job.

    $MODEL/$TT/$DATA wildcards in ``args_string`` survive verbatim, like
    the reference's template variables (cluster_handling.py:27-110).
    """
    os.makedirs(outdir, exist_ok=True)
    tpu_directive = f"#SBATCH --gres=tpu:{tpu_type}\n" if tpu_type else ""
    array_directive = f"#SBATCH --array=0-{n_array - 1}\n" if n_array else ""
    command = f"{executable} {args_string}"
    script = SLURM_TEMPLATE.format(
        job_name=job_name, outdir=outdir, walltime=walltime, cpus=cpus,
        tpu_directive=tpu_directive, array_directive=array_directive,
        extra_lines="\n".join(extra_lines), command=command)
    path = script_name or os.path.join(outdir, f"{job_name}.sbatch")
    with open(path, "w") as f:
        f.write(script)
    return path


def multi_config_analysis(config_path, parallel=False, max_workers=4,
                          dry_run=False):
    """Run a yaml of analysis configurations (reference :116-164).

    yaml format: {run_label: {flag: value, ...}, ...}; each run becomes a
    ``lightcurve-analysis`` invocation (in-process when dry_run, else a
    subprocess), serial or thread-parallel.
    """
    import yaml
    with open(config_path) as f:
        runs = yaml.safe_load(f)

    commands = []
    for label, flags in runs.items():
        argv = []
        for key, value in (flags or {}).items():
            flag = "--" + str(key).replace("_", "-")
            if isinstance(value, bool):
                if value:
                    argv.append(flag)
            else:
                argv.extend([flag, str(value)])
        if "--label" not in argv:
            argv.extend(["--label", str(label)])
        commands.append((label, argv))

    if dry_run:
        return commands

    def run_one(item):
        label, argv = item
        r = subprocess.run(["lightcurve-analysis", *argv],
                           capture_output=True, text=True)
        if r.returncode != 0:
            # a silent nonzero returncode is undiagnosable: surface the
            # subprocess's own error text
            tail = (r.stderr or r.stdout or "").strip()[-2000:]
            print(f"[{label}] FAILED (rc={r.returncode}):\n{tail}",
                  flush=True)
        return label, r.returncode

    if parallel:
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            return list(pool.map(run_one, commands))
    return [run_one(c) for c in commands]
