from .detectors import Detector, get_detector
from .likelihood import GWTransientLikelihood, InterferometerData
from .waveforms import taylorf2_tidal

__all__ = ["Detector", "get_detector", "GWTransientLikelihood",
           "InterferometerData", "taylorf2_tidal"]
