from .detectors import Detector, get_detector
from .likelihood import GWTransientLikelihood, InterferometerData
from .relative_binning import RelativeBinningGWLikelihood
from .waveforms import taylorf2_tidal

__all__ = ["Detector", "get_detector", "GWTransientLikelihood",
           "RelativeBinningGWLikelihood", "InterferometerData",
           "taylorf2_tidal"]
