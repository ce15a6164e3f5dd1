from .gp import (GPSurrogate, load_gp_surrogate, save_gp_surrogate,
                 svd_gp_surrogate_mags, train_svd_gp_model)
from .gp_compact import (CompactGPSurrogate, fit_compact_gp,
                         train_svd_compact_gp_model)
from .svd import (SVDTrainingConfig, benchmark_svd_model, read_bulla_grid,
                  train_svd_model)

__all__ = ["SVDTrainingConfig", "train_svd_model", "read_bulla_grid",
           "benchmark_svd_model", "GPSurrogate", "train_svd_gp_model",
           "svd_gp_surrogate_mags", "save_gp_surrogate",
           "load_gp_surrogate", "CompactGPSurrogate", "fit_compact_gp",
           "train_svd_compact_gp_model"]
