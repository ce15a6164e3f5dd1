"""Masked autoregressive normalizing flow in flax.

TPU-native counterpart of the reference's torch/nflows stack
(``nmma/mlmodel/normalizingflows.py:66-90``: 9 masked-affine
autoregressive transforms with 90 hidden units, permutations between
layers, standard-normal base, conditioned on a light-curve embedding).
Implemented as MADE-style masked dense layers; ``log_prob`` and ``sample``
are pure jax functions batched on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _made_masks(dim, hidden, n_hidden_layers=1):
    """Binary masks enforcing the autoregressive property."""
    degrees_in = np.arange(1, dim + 1)
    degrees_hidden = (np.arange(hidden) % max(dim - 1, 1)) + 1
    masks = []
    prev = degrees_in
    for _ in range(n_hidden_layers):
        masks.append((degrees_hidden[:, None] >= prev[None, :]).astype(
            np.float32))
        prev = degrees_hidden
    # output mask: strict inequality (outputs depend on strictly earlier dims)
    out_degrees = np.tile(degrees_in, 2)   # shift + log_scale per dim
    masks.append((out_degrees[:, None] > prev[None, :]).astype(np.float32))
    return masks


class MaskedDense(nn.Module):
    features: int
    mask: np.ndarray

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ (kernel * jnp.asarray(self.mask.T)) + bias


class MADEBlock(nn.Module):
    """One masked affine autoregressive transform with context."""

    dim: int
    hidden: int = 90

    @nn.compact
    def __call__(self, x, context):
        masks = _made_masks(self.dim, self.hidden)
        h = MaskedDense(self.hidden, masks[0])(x)
        if context is not None:
            h = h + nn.Dense(self.hidden)(context)
        h = nn.relu(h)
        out = MaskedDense(2 * self.dim, masks[-1])(h)
        if context is not None:
            # direct context path to every output: the autoregressive
            # output mask blocks the FIRST dimension from all hidden
            # units (its parameters may depend on no earlier x), so
            # without this the leading dimension — and a 1-D flow
            # entirely — would be unconditioned on the light curve
            out = out + nn.Dense(2 * self.dim)(context)
        shift, log_scale = out[..., :self.dim], out[..., self.dim:]
        log_scale = jnp.tanh(log_scale) * 3.0   # stability clamp
        return shift, log_scale


class MaskedAutoregressiveFlow(nn.Module):
    """Stack of MADE transforms with fixed permutations between layers."""

    dim: int
    n_transforms: int = 9
    hidden: int = 90

    def setup(self):
        self.blocks = [MADEBlock(self.dim, self.hidden)
                       for _ in range(self.n_transforms)]
        rng = np.random.default_rng(0)
        self.perms = [jnp.asarray(rng.permutation(self.dim))
                      for _ in range(self.n_transforms)]

    def log_prob(self, x, context=None):
        """log q(x | context); x [..., dim]."""
        log_det = jnp.zeros(x.shape[:-1])
        z = x
        for block, perm in zip(self.blocks, self.perms):
            z = z[..., perm]
            shift, log_scale = block(z, context)
            # inverse (data -> noise) pass of the affine transform
            z = (z - shift) * jnp.exp(-log_scale)
            log_det = log_det - jnp.sum(log_scale, axis=-1)
        base = -0.5 * jnp.sum(z * z, axis=-1) \
            - 0.5 * self.dim * jnp.log(2.0 * jnp.pi)
        return base + log_det

    def sample(self, key, n, context=None):
        """Draw n samples (forward pass: noise -> data, sequential in dim)."""
        z = jax.random.normal(key, (n, self.dim))
        if context is not None and context.ndim == 1:
            context = jnp.broadcast_to(context, (n, context.shape[-1]))
        x = z
        for block, perm in zip(reversed(self.blocks), reversed(self.perms)):
            # invert the affine autoregressive transform dimension by
            # dimension (forward sampling is inherently sequential)
            y = jnp.zeros_like(x)
            for d in range(self.dim):
                shift, log_scale = block(y, context)
                y = y.at[..., d].set(
                    x[..., d] * jnp.exp(log_scale[..., d]) + shift[..., d])
            inv_perm = jnp.argsort(perm)
            x = y[..., inv_perm]
        return x
