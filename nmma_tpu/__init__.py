"""nmma_tpu — TPU-native multimessenger Bayesian inference framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of NMMA
(nuclear-multimessenger-astronomy/nmma): kilonova / GRB-afterglow /
supernova / shock-cooling light-curve fitting, gravitational-wave and
equation-of-state inference, joint multimessenger posteriors — built
batched, static-shaped and pure-functional for TPU device meshes.
"""

__version__ = "0.1.0"

from . import constants
from .cosmology import Cosmology, get_cosmology, set_cosmology

__all__ = ["constants", "Cosmology", "get_cosmology", "set_cosmology", "__version__"]
