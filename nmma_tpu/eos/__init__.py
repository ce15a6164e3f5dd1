from .eos import EOSTable, TabulatedEOSSet, load_macro_eos_set
from .tov import construct_family, tov_solve

__all__ = ["EOSTable", "TabulatedEOSSet", "load_macro_eos_set",
           "tov_solve", "construct_family"]
