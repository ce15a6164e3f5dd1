"""Model-registry parity with the reference's model_parameters_dict.

Pins every model family name and canonical parameter list against the
reference inventory (nmma/em/model.py:29-132) so a silently dropped or
renamed family fails loudly, and exercises the grid filename parsers for
the families added to close the inventory (Bu2023Ye, CV, LANL variants).
"""

from nmma_tpu.models.base import MODEL_PARAMETERS
from nmma_tpu.training.svd import GRID_PARSERS

# transcribed from the reference model_parameters_dict
# (nmma/em/model.py:29-132)
REFERENCE_MODELS = {
    "Arnett": ["tau_m", "log10_mni"],
    "Arnett_modified": ["tau_m", "log10_mni", "t_0"],
    "Bu2019nsbh": ["log10_mej_dyn", "log10_mej_wind", "KNtheta"],
    "Bu2019lm": ["log10_mej_dyn", "log10_mej_wind", "KNphi", "KNtheta"],
    "Bu2019lm_sparse": ["log10_mej_dyn", "log10_mej_wind"],
    "Ka2017": ["log10_mej", "log10_vej", "log10_Xlan"],
    "TrPi2018": [
        "inclination_EM", "log10_E0", "thetaCore", "thetaWing", "b", "L0",
        "q", "ts", "log10_n0", "p", "log10_epsilon_e", "log10_epsilon_B",
        "xi_N", "d_L",
    ],
    "Piro2021": ["log10_Menv", "log10_Renv", "log10_Ee"],
    "Me2017": ["log10_mej", "log10_vej", "beta", "log10_kappa_r"],
    "HoNa2020": [
        "log10_mej", "vej_max", "vej_min", "vej_frac",
        "log10_kappa_low_vej", "log10_kappa_high_vej",
    ],
    "Bu2022mv": ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind",
                 "KNtheta"],
    "PL_BB_fixedT": ["bb_luminosity", "temperature", "beta", "powerlaw_mag"],
    "blackbody_fixedT": ["bb_luminosity", "temperature"],
    "synchrotron_powerlaw": ["alpha_time", "beta_freq", "F_ref",
                             "luminosity_distance"],
    "CV": ["example_num"],
    "AnBa2022_sparse": ["mrp", "xmix"],
    "AnBa2022_log": ["log10_mtot", "log10_mni", "vej", "log10_mrp", "xmix"],
    "AnBa2022_linear": ["mtot", "mni", "vej", "mrp", "xmix"],
    "salt2": ["x0", "x1", "c"],
    "Sr2023": ["a_AG", "alpha_AG", "f_nu_host"],
    "Bu2022Ye": ["log10_mej_dyn", "vej_dyn", "Yedyn", "log10_mej_wind",
                 "vej_wind", "KNtheta"],
    "Bu2023Ye": ["log10_mej_dyn", "vej_dyn", "Yedyn", "log10_mej_wind",
                 "vej_wind", "Yewind", "KNtheta"],
    "LANL2022": ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind",
                 "KNtheta"],
    "LANLTP1": ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind",
                "KNtheta"],
    "LANLTP2": ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind",
                "KNtheta"],
    "LANLTS1": ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind",
                "KNtheta"],
    "LANLTS2": ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind",
                "KNtheta"],
}


def test_every_reference_model_family_registered():
    missing = sorted(set(REFERENCE_MODELS) - set(MODEL_PARAMETERS))
    assert not missing, f"missing model families: {missing}"


def test_parameter_lists_match_reference():
    for name, params in REFERENCE_MODELS.items():
        assert MODEL_PARAMETERS[name] == params, name


def test_bu2023ye_grid_parser():
    parse, names = GRID_PARSERS["Bu2023Ye"]
    out = parse("0.005_0.15_0.15_0.050_0.05_0.30_45.57.dat")
    assert abs(out["log10_mej_dyn"] - (-2.301029995)) < 1e-6
    assert out["vej_dyn"] == 0.15
    assert out["Yedyn"] == 0.15
    assert abs(out["log10_mej_wind"] - (-1.301029995)) < 1e-6
    assert out["Yewind"] == 0.30
    assert out["KNtheta"] == 45.57


def test_cv_grid_parser():
    parse, names = GRID_PARSERS["CV"]
    assert names == ["example_num"]
    assert parse("example_3.dat") == {"example_num": 3.0}
    assert parse("no_numbers_here.dat")["example_num"] == 0.0


def test_lanl_variants_share_parser():
    base = GRID_PARSERS["LANL2022"]
    for name in ("LANLTP1", "LANLTP2", "LANLTS1", "LANLTS2"):
        parse, params = GRID_PARSERS[name]
        assert parse is base[0]
        assert params == base[1]
