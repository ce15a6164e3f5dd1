"""The four round-2-missing console scripts (VERDICT r2 missing #7 /
next-round #10): lightcurve-injection-slurm-setup,
create-lightcurve-slurm, svdmodel-download, resample-grid."""

import json
import os

import numpy as np
import pytest


PRIOR = """\
log10_mej = Uniform(minimum=-3., maximum=-1.)
log10_vej = Uniform(minimum=-2., maximum=-0.5)
luminosity_distance = 40.0
"""


def test_injection_slurm_setup(tmp_path):
    from nmma_tpu.cli.tools import injection_slurm_setup

    prior = tmp_path / "inj.prior"
    prior.write_text(PRIOR)
    template = tmp_path / "template.sh"
    template.write_text(
        "#!/bin/bash\nlightcurve-analysis --prior PRIOR --outdir OUTDIR "
        "--light-curve-data INJOUT --label run_INJNUM\n")
    scripts = injection_slurm_setup([
        "--prior-file", str(prior), "--analysis-file", str(template),
        "--n-injection", "3", "--outdir", str(tmp_path / "jobs")])
    assert len(scripts) == 3
    body = open(scripts[1]).read()
    assert "PRIOR" not in body and "INJNUM" not in body
    assert "--label run_1" in body
    assert (tmp_path / "jobs" / "1" / "injection.prior").exists()
    inj = json.load(open(tmp_path / "jobs" / "1" / "injection.json"))
    content = inj["injections"]["content"]
    assert -3.0 <= content["log10_mej"][0] <= -1.0


def test_create_lightcurve_slurm(tmp_path):
    from nmma_tpu.cli.tools import create_lightcurve_slurm
    from nmma_tpu.injections import write_injection_file

    inj = tmp_path / "inj.json"
    rng = np.random.default_rng(0)
    write_injection_file(str(inj), {
        "log10_mej": rng.uniform(-3, -1, 25),
        "log10_vej": rng.uniform(-2, -0.5, 25)})
    template = tmp_path / "template.sh"
    template.write_text("#!/bin/bash\nlightcurve-generation "
                        "--injection-range INJRANGE\n")
    scripts = create_lightcurve_slurm([
        "--injection", str(inj), "--analysis-file", str(template),
        "--n-per-job", "10", "--outdir", str(tmp_path / "jobs")])
    assert len(scripts) == 3
    assert "--injection-range 10,20" in open(scripts[1]).read()
    assert "--injection-range 20,25" in open(scripts[2]).read()
    assert (tmp_path / "jobs" / "logs").is_dir()


def test_svdmodel_download_local_and_hook(tmp_path):
    from nmma_tpu.cli.tools import svdmodel_download
    from nmma_tpu import registry

    # local resolution
    home = tmp_path / "models"
    home.mkdir()
    (home / "MyModel.npz").write_bytes(b"x")
    out = svdmodel_download(["--model", "MyModel",
                             "--svd-path", str(home)])
    assert out == str(home / "MyModel.npz")

    # hook-based fetch (the air-gapped bundle path)
    def hook(name, dest):
        with open(os.path.join(dest, f"{name}.npz"), "wb") as fh:
            fh.write(b"y")
    registry.set_download_hook(hook)
    try:
        out = svdmodel_download(["--model", "Fetched",
                                 "--svd-path", str(home)])
        assert out.endswith("Fetched.npz") and os.path.exists(out)
    finally:
        registry.set_download_hook(None)

    # unknown model: ValueError, the reference's get_model contract
    # (gitlab.py raise for a name missing from models.yaml); with the
    # registry unreachable the message notes the local-scan fallback
    with pytest.raises(ValueError, match="not found in models list"):
        svdmodel_download(["--model", "Absent", "--svd-path", str(home)])


def test_resample_grid(tmp_path):
    h5py = pytest.importorskip("h5py")
    from nmma_tpu.cli.tools import resample_grid

    grid = tmp_path / "grid.h5"
    with h5py.File(grid, "w") as f:
        for i in range(20):
            g = f.create_group(f"entry_{i:02d}")
            g.create_dataset("mags", data=np.full((3, 5), float(i)))
    outs = resample_grid(["--gridpath", str(grid), "--downsample",
                          "--factor", "4"])
    with h5py.File(outs[0], "r") as f:
        assert len(f.keys()) == 5
    outs = resample_grid(["--gridpath", str(grid), "--fragment",
                          "--factor", "4"])
    assert len(outs[0]) == 4
    total = 0
    for path in outs[0]:
        with h5py.File(path, "r") as f:
            total += len(f.keys())
    assert total == 20
    with pytest.raises(ValueError):
        resample_grid(["--gridpath", str(grid)])
