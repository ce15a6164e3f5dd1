"""LIGO-LW sim_inspiral ingestion (stdlib XML + spin transform)."""

import gzip

import numpy as np
import pytest

_COLS = ["simulation_id", "mass1", "mass2", "spin1x", "spin1y", "spin1z",
         "spin2x", "spin2y", "spin2z", "inclination", "coa_phase",
         "distance", "longitude", "latitude", "polarization",
         "geocent_end_time", "geocent_end_time_ns"]


def _write_ligolw(path, rows, prefixed=True, gz=False):
    pre = "sim_inspiral:" if prefixed else ""
    tbl_name = "sim_inspiral:table"
    cols = "\n".join(
        f'      <Column Name="{pre}{c}" Type="real_8"/>' if c != "simulation_id"
        else f'      <Column Name="{pre}{c}" Type="ilwd:char"/>'
        for c in _COLS)
    body = ",\n      ".join(
        ",".join(f'"sim_inspiral:simulation_id:{int(v)}"' if i == 0
                 else repr(float(v)) for i, v in enumerate(row))
        for row in rows)
    text = f"""<?xml version='1.0' encoding='utf-8'?>
<!DOCTYPE LIGO_LW SYSTEM "http://ldas-sw.ligo.caltech.edu/doc/ligolwAPI/html/ligolw_dtd.txt">
<LIGO_LW>
  <Table Name="{tbl_name}">
{cols}
      <Stream Name="{tbl_name}" Type="Local" Delimiter=",">
      {body}
      </Stream>
  </Table>
</LIGO_LW>
"""
    if gz:
        with gzip.open(path, "wt") as fh:
            fh.write(text)
    else:
        with open(path, "w") as fh:
            fh.write(text)


def test_read_ligolw_and_mapping(tmp_path):
    from nmma_tpu.injections import read_injection_file
    p = str(tmp_path / "inj.xml")
    # row: masses deliberately unsorted; aligned spins
    _write_ligolw(p, [
        [0, 1.2, 1.6, 0, 0, 0.04, 0, 0, -0.02, 0.4, 1.0, 120.0, 1.1, -0.5,
         0.3, 1187008882, 400000000],
    ])
    inj = read_injection_file(p)
    assert inj["mass_1"][0] == pytest.approx(1.6)      # sorted m1 >= m2
    assert inj["mass_2"][0] == pytest.approx(1.2)
    assert inj["luminosity_distance"][0] == pytest.approx(120.0)
    assert inj["ra"][0] == pytest.approx(1.1)
    assert inj["dec"][0] == pytest.approx(-0.5)
    assert inj["psi"][0] == pytest.approx(0.3)
    assert inj["geocent_time"][0] == pytest.approx(1187008882.4)
    # aligned spins: theta_jn == inclination, tilts 0 / pi, a = |chi_z|
    assert inj["theta_jn"][0] == pytest.approx(0.4, abs=1e-12)
    assert inj["tilt_1"][0] == pytest.approx(0.0)
    assert inj["tilt_2"][0] == pytest.approx(np.pi)
    assert inj["a_1"][0] == pytest.approx(0.04)
    assert inj["a_2"][0] == pytest.approx(0.02)
    assert inj["simulation_id"][0] == 0


def test_ligolw_gz_and_plain_names(tmp_path):
    from nmma_tpu.io.ligolw import read_ligolw_table
    p = str(tmp_path / "inj.xml.gz")
    _write_ligolw(p, [[3, 1.4, 1.3, 0, 0, 0, 0, 0, 0, 0.1, 0.0, 40.0,
                       0.0, 0.0, 0.0, 0, 0]], prefixed=False, gz=True)
    tbl = read_ligolw_table(p)
    assert tbl["simulation_id"][0] == 3
    assert tbl["mass1"][0] == pytest.approx(1.4)


def test_precessing_transform_consistency():
    """Frame-independent outputs + J-construction sanity for precession."""
    from nmma_tpu.io.ligolw import transform_precessing_wvf2pe
    th, pj, t1, t2, p12, a1, a2 = transform_precessing_wvf2pe(
        0.5, 0.3, 0.1, 0.2, -0.1, 0.2, 0.1, 1.5, 1.3, 20.0, 0.7)
    assert a1 == pytest.approx(np.sqrt(0.09 + 0.01 + 0.04))
    assert t1 == pytest.approx(np.arccos(0.2 / a1))
    assert p12 == pytest.approx(
        (np.arctan2(0.2, -0.1) - np.arctan2(0.1, 0.3)) % (2 * np.pi))
    assert 0 <= th <= np.pi and 0 <= pj < 2 * np.pi
    # at BNS spins L >> S: theta_jn stays close to the inclination
    assert abs(th - 0.5) < 0.05
