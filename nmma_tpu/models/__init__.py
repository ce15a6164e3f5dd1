from .base import (MODEL_PARAMETERS, DetectorLightCurveModel, SourceModel,
                   get_source_model, register_source_model)
from .fiesta import (FiestaSurrogateData, load_fiesta_surrogate,
                     make_fiesta_source_model)
from .spectral import (make_spectral_source_model, spectral_model_from_file)

__all__ = [
    "MODEL_PARAMETERS",
    "DetectorLightCurveModel",
    "SourceModel",
    "get_source_model",
    "register_source_model",
    "make_spectral_source_model",
    "spectral_model_from_file",
    "FiestaSurrogateData",
    "load_fiesta_surrogate",
    "make_fiesta_source_model",
]
