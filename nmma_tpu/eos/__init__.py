from .cse import cse_eos_family, cse_extend, mixed_low_density_eos
from .likelihood import tabulate_weighted_eos
from .emulator import TOVEmulator, train_tov_emulator
from .lec import (LEC7_PARAMETERS, LEC13_PARAMETERS, LECEmulatorSet,
                  ingest_reference_lec)
from .eos import EOSTable, TabulatedEOSSet, load_macro_eos_set
from .generation import (crust_from_micro_table, eos_from_nep,
                         nep_eos_table)
from .tov import construct_family, tov_solve

__all__ = ["EOSTable", "TabulatedEOSSet", "load_macro_eos_set",
           "tov_solve", "construct_family", "eos_from_nep",
           "crust_from_micro_table", "nep_eos_table",
           "cse_eos_family", "cse_extend", "mixed_low_density_eos",
           "tabulate_weighted_eos", "TOVEmulator",
           "LECEmulatorSet", "ingest_reference_lec",
           "LEC7_PARAMETERS", "LEC13_PARAMETERS",
           "train_tov_emulator"]
