"""Light-curve embedding network (1-D conv ResNet).

Counterpart of the reference's torch similarity embedding
(``nmma/mlmodel/resnet.py:228-468`` + ``embedding.py:17-178``): a small
1-D residual CNN over dense [F, T] light-curve tensors producing the
conditioning vector for the normalizing-flow posterior. It can be
trained jointly end-to-end with the flow, or VICReg-pretrained like the
reference (``mlmodel/vicreg.py`` implements the similarity objective
with the paper's loss weights).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ResBlock1D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, kernel_size=(3,), padding="SAME")(x)
        h = nn.relu(h)
        h = nn.Conv(self.channels, kernel_size=(3,), padding="SAME")(h)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, kernel_size=(1,))(x)
        return nn.relu(x + h)


class LightCurveEmbedding(nn.Module):
    """[..., F, T] magnitudes -> [..., embed_dim] feature vector."""

    embed_dim: int = 20
    channels: int = 32
    mag_ref: float = 25.0      # brightness standardization: (ref - mag)/scale
    mag_scale: float = 5.0
    invalid_value: float = -3.0  # sentinel for non-detections / padding

    @nn.compact
    def __call__(self, lc):
        # channels-last over the time axis: [..., T, F]
        x = jnp.swapaxes(lc, -1, -2)
        finite = jnp.isfinite(x)
        x = jnp.where(finite, (self.mag_ref - jnp.where(finite, x, 0.0))
                      / self.mag_scale, self.invalid_value)
        x = ResBlock1D(self.channels)(x)
        x = nn.avg_pool(x, window_shape=(2,), strides=(2,))
        x = ResBlock1D(self.channels)(x)
        x = nn.avg_pool(x, window_shape=(2,), strides=(2,))
        x = ResBlock1D(self.channels)(x)
        x = jnp.mean(x, axis=-2)           # global average over time
        x = nn.Dense(64)(x)
        x = nn.relu(x)
        return nn.Dense(self.embed_dim)(x)
