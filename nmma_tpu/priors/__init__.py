from .astro import create_prior_from_args, extinction_prior, hubble_prior
from .core import (Constraint, Cosine, DeltaFunction, Gaussian, Interped,
                   LogUniform, PowerLaw, Prior, PriorDict, Sine,
                   TruncatedGaussian, Uniform,
                   WeightedCategorical)
from .parser import load_prior_file, parse_prior_dict

__all__ = [
    "Prior", "PriorDict", "Uniform", "DeltaFunction", "Sine", "Cosine",
    "PowerLaw", "Gaussian", "TruncatedGaussian", "LogUniform", "Interped",
    "Constraint", "WeightedCategorical", "load_prior_file", "parse_prior_dict",
    "create_prior_from_args", "extinction_prior", "hubble_prior",
]
