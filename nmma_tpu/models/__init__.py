from .base import (MODEL_PARAMETERS, DetectorLightCurveModel, SourceModel,
                   get_source_model, register_source_model)

__all__ = [
    "MODEL_PARAMETERS",
    "DetectorLightCurveModel",
    "SourceModel",
    "get_source_model",
    "register_source_model",
]
