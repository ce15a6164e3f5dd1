from .kde import GaussianKDE
from .hubble import (hubble_posterior_from_distance_samples,
                     combine_hubble_posteriors, hdi, h0_trend_from_kdes,
                     event_h0_kdes)
from .resampling import GWEMResampler
from .ns_characteristics import (combine_eos_posteriors,
                                 eos_probs_from_posterior,
                                 estimate_observable_trend)

__all__ = [
    "GaussianKDE",
    "hubble_posterior_from_distance_samples",
    "combine_hubble_posteriors",
    "hdi",
    "h0_trend_from_kdes",
    "event_h0_kdes",
    "GWEMResampler",
    "combine_eos_posteriors",
    "eos_probs_from_posterior",
    "estimate_observable_trend",
]
