from .svd import (SVDTrainingConfig, benchmark_svd_model, read_bulla_grid,
                  train_svd_model)

__all__ = ["SVDTrainingConfig", "train_svd_model", "read_bulla_grid",
           "benchmark_svd_model"]
