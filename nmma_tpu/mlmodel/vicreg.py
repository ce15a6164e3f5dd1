"""VICReg similarity pre-training for the light-curve embedding.

Counterpart of the reference's self-supervised embedding stage
(``nmma/mlmodel/embedding.py:17-52`` VICRegLoss, ``:140-178``
SimilarityEmbedding, ``:181-284`` train/val loops): an embedding network
f producing a low-dimensional *representation*, topped by an expander
head h, trained so that augmented views of the same light curve map to
the same expanded vector (invariance) while the batch stays spread out
(variance hinge) and decorrelated (covariance penalty).  The trained
representation is then frozen and used as the conditioning context of
the normalizing-flow posterior (``inference.train_flow_posterior`` with
``raw_context=True``), exactly how the reference consumes its shipped
``similarity_embedding_weights.pth``.

TPU notes: the whole epoch runs as one ``lax.scan`` over minibatches
inside a single jit (one device dispatch per block, not per batch), and
the loss is pure jnp - no torch-style in-place ops.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .embedding import LightCurveEmbedding


def vicreg_loss(x, y, wt_repr=1.0, wt_cov=1.0, wt_std=1.0):
    """Variance-Invariance-Covariance regularization (Bardes+22).

    Mirrors the reference's VICRegLoss.forward term for term
    (embedding.py:24-45): MSE invariance between the two views, a hinge
    on the per-dimension standard deviation (keeps the batch from
    collapsing), and the squared off-diagonal covariance (decorrelates
    dimensions).  Returns (total, repr_loss, cov_loss, std_loss).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n, d = x.shape
    repr_loss = jnp.mean((x - y) ** 2)

    xc = x - jnp.mean(x, axis=0)
    yc = y - jnp.mean(y, axis=0)
    std_x = jnp.sqrt(jnp.var(xc, axis=0) + 1e-4)
    std_y = jnp.sqrt(jnp.var(yc, axis=0) + 1e-4)
    std_loss = (jnp.mean(nn.relu(1.0 - std_x)) / 2
                + jnp.mean(nn.relu(1.0 - std_y)) / 2)

    # NOTE: the reference squares each per-sample outer product before
    # summing over the batch (embedding.py:36-41 unsqueezes to [N,1,D]
    # so cov_x is N outer products, not their sum) - a deviation from
    # the VICReg paper it cites.  We follow the published formula: the
    # batch covariance matrix, then the squared off-diagonal.
    xn = xc / std_x
    yn = yc / std_y
    cov_x = xn.T @ xn / (n - 1)
    cov_y = yn.T @ yn / (n - 1)
    off = 1.0 - jnp.eye(d)
    cov_loss = (jnp.sum((cov_x * off) ** 2) / d
                + jnp.sum((cov_y * off) ** 2) / d)

    total = wt_repr * repr_loss + wt_cov * cov_loss + wt_std * std_loss
    return total, repr_loss, cov_loss, std_loss


class SimilarityEmbedder(nn.Module):
    """Embedding trunk f + contraction + expander head h.

    Counterpart of the reference's SimilarityEmbedding
    (embedding.py:140-178): ``__call__`` returns ``(expanded,
    representation)`` - the VICReg loss trains on the expanded vector,
    downstream conditioning consumes the representation (the reference's
    ``torch.clone(x)`` after the contraction layer).
    """

    num_dim: int = 7            # representation width (reference default
    num_dim_final: int = 10     # layout: similarity dim 7 -> final 5/10)
    num_hidden_layers_h: int = 1
    expander_hidden: int = 20
    trunk_channels: int = 32

    @nn.compact
    def __call__(self, lc):
        feat = LightCurveEmbedding(embed_dim=64,
                                   channels=self.trunk_channels)(lc)
        representation = nn.Dense(self.num_dim)(feat)
        h = jnp.tanh(nn.Dense(self.expander_hidden)(representation))
        for _ in range(self.num_hidden_layers_h):
            h = jnp.tanh(nn.Dense(self.expander_hidden)(h))
        expanded = nn.Dense(self.num_dim_final)(h)
        return expanded, representation


def augment_lightcurves(rng, lcs, max_shift=4, mag_jitter=0.1):
    """Random time-shift + photometric-jitter views of [N, F, T] curves.

    The reference pretrains on (augmented_shift, unshifted) light-curve
    pairs - time-translated copies of the same event (embedding.py
    train_one_epoch_se consumes ``augmented_shift``/``unshifted_shift``
    tensors built upstream).  Non-finite entries (padding) stay
    non-finite so the embedding's sentinel masking is preserved.
    """
    lcs = np.asarray(lcs, dtype=np.float32)
    n, f, t = lcs.shape
    shifts = rng.integers(-max_shift, max_shift + 1, size=n)
    out = np.empty_like(lcs)
    for i, s in enumerate(shifts):
        if s == 0:
            out[i] = lcs[i]
        elif s > 0:
            out[i, :, s:] = lcs[i, :, :-s]
            out[i, :, :s] = np.nan
        else:
            out[i, :, :s] = lcs[i, :, -s:]
            out[i, :, s:] = np.nan
    out = out + rng.normal(0.0, mag_jitter, out.shape).astype(np.float32)
    return out


def pretrain_similarity_embedding(lightcurves, num_dim=7, num_dim_final=10,
                                  n_epochs=100, batch_size=128,
                                  learning_rate=1e-3, max_shift=4,
                                  mag_jitter=0.1, wt_repr=25.0, wt_cov=1.0,
                                  wt_std=25.0, seed=0, verbose=True):
    """Self-supervised VICReg pre-training over simulated light curves.

    Counterpart of the reference's train/val epoch loops
    (embedding.py:181-284, minus the tensorboard plumbing).  Returns
    ``(embedder, params, history)`` where
    ``embedder.apply(params, lc)[1]`` is the frozen representation; feed
    it to ``train_flow_posterior(..., raw_context=True)``.

    Default loss weights are the VICReg paper's (Bardes+22 §4.2:
    invariance 25, variance 25, covariance 1) rather than the reference
    loss function's (1, 1, 1) defaults: with equal weights the optimizer
    prefers the collapsed basin — zero both the invariance and variance
    terms and eat the constant hinge penalty — once trained past a few
    dataset passes (measured on the test-suite toy problem; the
    reference never calls its epoch loop in-package, so its defaults
    are untrained-against).
    """
    lcs = np.asarray(lightcurves, dtype=np.float32)
    n = len(lcs)
    rng = np.random.default_rng(seed)

    embedder = SimilarityEmbedder(num_dim=num_dim,
                                  num_dim_final=num_dim_final)
    params = embedder.init(jax.random.PRNGKey(seed), jnp.asarray(lcs[:2]))
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)
    bsz = min(batch_size, n)

    def step(carry, batch):
        params, opt_state = carry
        aug, orig = batch

        def loss_fn(p):
            ex, _ = embedder.apply(p, aug)
            ey, _ = embedder.apply(p, orig)
            total, r, c, s = vicreg_loss(ex, ey, wt_repr=wt_repr,
                                         wt_cov=wt_cov, wt_std=wt_std)
            return total, (r, c, s)

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def run_block(params, opt_state, aug_block, orig_block):
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (aug_block, orig_block))
        return params, opt_state, losses

    # one epoch = one full shuffled pass over the dataset in minibatches
    # (the reference trains full-dataset epoch loops, embedding.py:181-284
    # — a single random minibatch per epoch would make total training
    # volume independent of the dataset size). Steps are grouped into
    # scan blocks of bounded size, one dispatch each — per-batch dispatch
    # is a remote round trip on axon.
    steps_per_epoch = max(1, n // bsz)
    step_indices = np.concatenate([
        rng.permutation(n)[:steps_per_epoch * bsz]
        .reshape(steps_per_epoch, bsz) for _ in range(n_epochs)])  # [S, B]
    block = 64
    history = []
    for s0 in range(0, len(step_indices), block):
        idx = step_indices[s0:s0 + block]
        orig_block = lcs[idx]                              # [k, B, F, T]
        aug_block = np.stack([
            augment_lightcurves(rng, orig_block[j], max_shift=max_shift,
                                mag_jitter=mag_jitter)
            for j in range(len(idx))])
        params, opt_state, losses = run_block(
            params, opt_state, jnp.asarray(aug_block),
            jnp.asarray(orig_block))
        history.extend(np.asarray(losses).tolist())
        if verbose:
            print(f"vicreg epoch {min(s0 + block, len(step_indices)) // steps_per_epoch:5d}"
                  f"/{n_epochs} loss {history[-1]:.4f}")

    return embedder, params, np.asarray(history)
