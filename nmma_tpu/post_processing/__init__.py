from .kde import GaussianKDE
from .hubble import hubble_posterior_from_distance_samples, combine_hubble_posteriors
from .resampling import GWEMResampler
from .ns_characteristics import combine_eos_posteriors

__all__ = [
    "GaussianKDE",
    "hubble_posterior_from_distance_samples",
    "combine_hubble_posteriors",
    "GWEMResampler",
    "combine_eos_posteriors",
]
