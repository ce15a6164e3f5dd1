"""Likelihood-free inference: simulate -> train conditional flow -> sample.

Counterpart of the reference's ``--sampler neuralnet`` path
(``nmma/em/analysis.py:176-307`` + ``mlmodel/``): train a normalizing-flow
posterior q(theta | lightcurve) on simulated pairs, then draw ~20k
posterior samples for observed data in one device pass (no MCMC).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .embedding import LightCurveEmbedding
from .flows import MaskedAutoregressiveFlow


class _ConditionalFlowNet(nn.Module):
    dim: int
    n_transforms: int = 6
    hidden: int = 90
    embed_dim: int = 20
    # raw_context=True: the conditioning input is a precomputed context
    # vector (e.g. the reference's pretrained similarity embedding) run
    # through a small trainable projection, instead of the trainable
    # light-curve ConvNet
    raw_context: bool = False

    def setup(self):
        if self.raw_context:
            self.embedding = _RawContextProjection(
                embed_dim=self.embed_dim)
        else:
            self.embedding = LightCurveEmbedding(embed_dim=self.embed_dim)
        self.flow = MaskedAutoregressiveFlow(
            dim=self.dim, n_transforms=self.n_transforms, hidden=self.hidden)

    def log_prob(self, theta, lc):
        ctx = self.embedding(lc)
        return self.flow.log_prob(theta, ctx)

    def sample(self, key, n, lc):
        ctx = self.embedding(lc)
        if ctx.ndim == 2:
            ctx = ctx[0]
        return self.flow.sample(key, n, ctx)


class _RawContextProjection(nn.Module):
    embed_dim: int = 20

    @nn.compact
    def __call__(self, ctx):
        h = nn.tanh(nn.Dense(self.embed_dim)(jnp.asarray(ctx)))
        return nn.Dense(self.embed_dim)(h)


@dataclass
class LFIPosterior:
    """Trained amortized posterior with standardization transforms."""

    net: _ConditionalFlowNet
    params: dict
    theta_mean: np.ndarray
    theta_std: np.ndarray
    parameter_names: tuple

    def sample(self, key, n, lightcurve):
        lc = jnp.asarray(lightcurve)
        if lc.ndim == 2:
            lc = lc[None]
        z = self.net.apply(self.params, key, n, lc,
                           method=_ConditionalFlowNet.sample)
        theta = np.asarray(z) * self.theta_std + self.theta_mean
        return {name: theta[:, i]
                for i, name in enumerate(self.parameter_names)}

    def log_prob(self, theta_dict, lightcurve):
        theta = jnp.stack([jnp.asarray(theta_dict[p])
                           for p in self.parameter_names], axis=-1)
        z = (theta - self.theta_mean) / self.theta_std
        lc = jnp.asarray(lightcurve)
        if lc.ndim == 2:
            lc = lc[None]
        return self.net.apply(self.params, z, lc,
                              method=_ConditionalFlowNet.log_prob)


def train_flow_posterior(theta, lightcurves, parameter_names,
                         n_transforms=6, hidden=90, n_epochs=500,
                         batch_size=256, learning_rate=1e-3, seed=0,
                         verbose=True, raw_context=False) -> LFIPosterior:
    """Fit q(theta | lc) by maximum likelihood on simulated pairs.

    theta [N, D]; lightcurves [N, F, T] (non-finite mags are zeroed by the
    embedding, mirroring the reference's padding of non-detections), or
    precomputed context vectors [N, C] with ``raw_context=True``.
    """
    theta = np.asarray(theta, dtype=np.float32)
    lightcurves = np.asarray(lightcurves, dtype=np.float32)
    n, dim = theta.shape
    t_mean = theta.mean(axis=0)
    t_std = theta.std(axis=0) + 1e-8
    z_all = jnp.asarray((theta - t_mean) / t_std)
    lc_all = jnp.asarray(lightcurves)

    net = _ConditionalFlowNet(dim=dim, n_transforms=n_transforms,
                              hidden=hidden, raw_context=raw_context)
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = net.init(init_key, z_all[:2], lc_all[:2],
                      method=_ConditionalFlowNet.log_prob)

    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    bsz = min(batch_size, n)

    def step(carry, idx):
        params, opt_state = carry
        z_batch, lc_batch = z_all[idx], lc_all[idx]

        def loss_fn(p):
            return -jnp.mean(net.apply(p, z_batch, lc_batch,
                                       method=_ConditionalFlowNet.log_prob))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), loss

    # scan a block of epochs per dispatch: per-epoch python dispatch is
    # one remote round trip each on the axon backend. Minibatch indices
    # are precomputed host-side (same numpy RNG stream as the original
    # per-epoch loop) and streamed through the scan.
    block = max(1, n_epochs // (5 if verbose else 1))
    rng = np.random.default_rng(seed)

    @jax.jit
    def run_block(params, opt_state, idx_block):
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), idx_block)
        return params, opt_state, losses[-1]

    done = 0
    while done < n_epochs:
        idx_block = jnp.asarray(np.stack([
            rng.choice(n, size=bsz, replace=False) for _ in range(block)]))
        params, opt_state, loss = run_block(params, opt_state, idx_block)
        done += block
        if verbose:
            print(f"flow epoch {min(done, n_epochs):5d} "
                  f"nll {float(loss):.4f}")

    return LFIPosterior(net=net, params=params, theta_mean=t_mean,
                        theta_std=t_std,
                        parameter_names=tuple(parameter_names))


def nnanalysis(analysis, n_train=3000, n_epochs=400, n_posterior=20000,
               noise_scale=None, seed=0, verbose=True,
               pretrained_embedding=False, vicreg_pretrain=False,
               vicreg_epochs=60):
    """Amortized-posterior analysis of an assembled ``EMAnalysis``.

    Counterpart of ``nnanalysis`` (nmma/em/analysis.py:176-307, the
    ``--sampler neuralnet`` path): simulate prior-predictive light curves
    through the forward model on its static grid, train the conditional
    flow, and draw ~20k posterior samples for the observed data in one
    device pass. The light-curve representation is the model's dense
    [F, T] magnitude tensor (observations interpolated onto the model
    grid; non-detections/missing epochs zeroed by the embedding, the
    reference's padding convention).

    Returns (posterior_dict, LFIPosterior).
    """
    priors = analysis.priors
    model = analysis.model
    names = list(priors.sampled_names)

    key = jax.random.PRNGKey(seed)
    key, draw_key, noise_key, samp_key = jax.random.split(key, 4)
    u = priors.sample_units(draw_key, n_train)
    theta_dict = jax.jit(priors.transform)(u)
    theta = np.column_stack([np.asarray(theta_dict[k]) for k in names])

    def fwd(u_row):
        p = priors.transform(u_row)
        _, mags = model(p)
        return mags                                   # [F, T]

    # chunked batched simulation (bounded device memory)
    sims = []
    fwd_b = jax.jit(jax.vmap(fwd))
    for i in range(0, n_train, 1024):
        sims.append(np.asarray(fwd_b(u[i:i + 1024])))
    mags = np.concatenate(sims)                       # [N, F, T]

    # per-filter noise at the observed error scale
    if noise_scale is None:
        sig = np.asarray(analysis.likelihood.data.sigmas)
        valid = np.asarray(analysis.likelihood.data.valid) & np.isfinite(sig)
        noise_scale = float(np.median(sig[valid])) if valid.any() else 0.1
    rng = np.random.default_rng(seed)
    # raw magnitudes go straight to the flow: the embedding applies its
    # own brightness standardization and non-finite sentinel, so missing
    # epochs stay distinguishable from data
    lcs = mags + rng.normal(0.0, noise_scale, mags.shape)

    # observed data -> the same representation (nan outside coverage)
    data = analysis.likelihood.data
    t_grid = np.asarray(model.sample_times)
    obs = np.full(mags.shape[1:], np.nan, dtype=np.float32)
    for i in range(obs.shape[0]):
        t_i = np.asarray(data.times[i])
        m_i = np.asarray(data.mags[i])
        good = np.asarray(data.valid[i]) & np.isfinite(
            np.asarray(data.sigmas[i]))
        if good.sum() < 2:
            continue
        obs[i] = np.interp(t_grid, t_i[good], m_i[good],
                           left=np.nan, right=np.nan)

    # train under the observation's coverage mask so the observed context
    # is in-distribution (the reference trains on survey-sampled curves
    # with the same padding pattern for the same reason)
    cover = np.isfinite(obs)
    lcs = np.where(cover[None], lcs, np.nan)

    if pretrained_embedding:
        # condition on the reference's SHIPPED similarity embedding
        # (mlmodel/pretrained.py; the reference's nnanalysis uses these
        # weights for the ztf-band Ka2017 path, em/analysis.py:176-307):
        # resample onto the 3 x 121 input the encoder was trained on,
        # non-detections at the reference's detection_limit = 22.0
        from .pretrained import PretrainedSimilarityEmbedding

        ztf = ("ztfg", "ztfr", "ztfi")
        filt_list = list(analysis.filters)
        missing = [f for f in ztf if f not in filt_list]
        if missing:
            raise ValueError(
                f"pretrained_embedding needs the ztf bands; missing "
                f"{missing} (reference embedding.py bands)")
        rows = [filt_list.index(f) for f in ztf]
        t121 = np.linspace(t_grid[0], t_grid[-1], 121)

        def to_input(batch_lcs):
            sel = batch_lcs[:, rows, :]               # [N, 3, T]
            out = np.empty((len(sel), 3, 121), dtype=np.float32)
            for i in range(len(sel)):
                for c in range(3):
                    row = sel[i, c]
                    good = np.isfinite(row)
                    out[i, c] = (np.interp(t121, t_grid[good], row[good])
                                 if good.sum() >= 2 else 22.0)
            return np.minimum(np.nan_to_num(out, nan=22.0), 22.0)

        encoder = PretrainedSimilarityEmbedding()
        ctx_train = np.asarray(encoder(to_input(lcs)))
        ctx_obs = np.asarray(encoder(to_input(obs[None])))[0]
        posterior = train_flow_posterior(theta, ctx_train, names,
                                         n_epochs=n_epochs, seed=seed,
                                         verbose=verbose,
                                         raw_context=True)
        samples = posterior.sample(samp_key, n_posterior,
                                   jnp.asarray(ctx_obs))
        return samples, posterior

    if vicreg_pretrain:
        # self-supervised VICReg stage on the simulated set, then freeze
        # the representation and condition the flow on it (the
        # reference's two-stage embedding.py -> flow pipeline)
        from .vicreg import pretrain_similarity_embedding

        embedder, vparams, _ = pretrain_similarity_embedding(
            lcs, n_epochs=vicreg_epochs, seed=seed, verbose=verbose)

        def represent(batch):
            _, rep = embedder.apply(vparams, jnp.asarray(batch))
            return np.asarray(rep)

        ctx_train = represent(lcs)
        ctx_obs = represent(obs[None])[0]
        posterior = train_flow_posterior(theta, ctx_train, names,
                                         n_epochs=n_epochs, seed=seed,
                                         verbose=verbose, raw_context=True)
        samples = posterior.sample(samp_key, n_posterior,
                                   jnp.asarray(ctx_obs))
        return samples, posterior

    posterior = train_flow_posterior(theta, lcs, names, n_epochs=n_epochs,
                                     seed=seed, verbose=verbose)
    samples = posterior.sample(samp_key, n_posterior, jnp.asarray(obs))
    return samples, posterior
