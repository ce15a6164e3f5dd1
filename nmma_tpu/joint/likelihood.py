"""Joint multimessenger likelihood: one conversion chain, summed messengers.

TPU-native counterpart of ``MultiMessengerLikelihood``
(``nmma/joint/joint_likelihood.py:20-87``): the shared
``MultimessengerConversion`` chain runs ONCE per sample, then every
messenger's log-likelihood is evaluated on the converted parameter dict and
summed — all inside a single jit, so GW inner products, EOS constraint
gathers and EM photometric chi^2 fuse into one XLA program that vmaps over
the live-point batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class MultiMessengerLikelihood:
    """Sum of messenger likelihoods behind one conversion chain.

    Parameters
    ----------
    conversion : callable params -> params (e.g. MultimessengerConversion)
    likelihoods : list of callables params -> scalar logL. EM likelihoods
        from `likelihood.em` and GW likelihoods from `gw.likelihood` both
        satisfy this protocol; EOS constraint terms can be adapted with a
        small closure providing their curves argument.
    """

    def __init__(self, conversion, likelihoods, sanity_keys=()):
        self.conversion = conversion
        self.likelihoods = list(likelihoods)
        self.sanity_keys = tuple(sanity_keys)

    def log_likelihood(self, parameters):
        p = self.conversion(parameters) if self.conversion else dict(parameters)
        total = jnp.asarray(0.0)
        for lk in self.likelihoods:
            total = total + lk(p)
        # non-finite chain outputs (e.g. BBH branch ejecta) => -inf
        for key in self.sanity_keys:
            total = jnp.where(jnp.isfinite(jnp.asarray(p[key])), total,
                              NEG_INF)
        return jnp.where(jnp.isnan(total), NEG_INF,
                         jnp.maximum(total, NEG_INF))

    def __call__(self, parameters):
        return self.log_likelihood(parameters)
