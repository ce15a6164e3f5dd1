from .astro import (adjust_priors_for_nmma, create_prior_from_args,
                    extinction_prior, h5_to_multivar_prior, hubble_prior)
from .core import (Constraint, Cosine, DeltaFunction, Gaussian, Interped,
                   LogUniform, PowerLaw, Prior, PriorDict, Sine,
                   TruncatedGaussian, Uniform,
                   WeightedCategorical, NMMADummyPrior,
                   multivariate_gaussian_priors)
from .parser import load_prior_file, parse_prior_dict

__all__ = [
    "Prior", "PriorDict", "Uniform", "DeltaFunction", "Sine", "Cosine",
    "PowerLaw", "Gaussian", "TruncatedGaussian", "LogUniform", "Interped",
    "Constraint", "WeightedCategorical", "load_prior_file", "parse_prior_dict",
    "create_prior_from_args", "extinction_prior", "hubble_prior",
    "adjust_priors_for_nmma", "h5_to_multivar_prior", "NMMADummyPrior",
    "multivariate_gaussian_priors",
]
