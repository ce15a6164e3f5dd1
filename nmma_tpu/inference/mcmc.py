"""Vectorized affine-invariant ensemble MCMC (Goodman & Weare 2010).

An independent posterior sampler sharing the nested sampler's contract
(``logl_fn: u_batch [B, ndim] -> logl [B]`` in the unit cube) for
cross-sampler validation and for users of the reference's multi-sampler
surface (``--sampler`` in nmma/em/analysis.py — the reference delegates
to bilby's emcee/dynesty/pymultinest backends; here the stretch move
itself is the TPU kernel).

Design: W walkers split into red/black halves; each sweep updates one
half against the other with the stretch move (z ~ g(z) ∝ 1/sqrt(z) on
[1/a, a]; accept ln-prob (d-1) ln z + dlogl, uniform prior = the unit
cube bounds mask). Whole sweeps run inside one ``lax.scan`` — two
batched likelihood calls of W/2 per sweep, no Python loop — so walkers
ride the same vmapped likelihood the nested sampler uses. No evidence
estimate (use the nested sampler for logZ).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class EnsembleMCMCConfig:
    walkers: int = 256           # total walkers (even; >= 2*ndim + 2)
    sweeps: int = 1500           # full red+black update sweeps
    burn_frac: float = 0.3       # fraction of sweeps discarded
    thin: int = 2                # keep every thin-th sweep
    chunk_sweeps: int = 500      # sweeps per device dispatch (bounds the
    #                              runtime of a single execution: one
    #                              monolithic scan of ~10k sweeps runs
    #                              minutes on-device, which remote-TPU
    #                              transports kill; the chunked loop is
    #                              the same chain — identical per-sweep
    #                              keys in the same order)
    stretch_a: float = 2.0       # stretch-move scale parameter
    temps: int = 1               # parallel-tempering ladder size
    t_max: float = 64.0          # hottest temperature (geometric ladder)
    evidence: bool = False       # stepping-stone ln Z (appends a beta=0
    #                              prior rung; needs temps >= 2)
    seed: int = 42


class EnsembleMCMCResult(NamedTuple):
    samples_u: np.ndarray        # [n_kept * walkers, ndim] unit cube
    chain_u: np.ndarray          # [n_kept, walkers, ndim]
    logl: np.ndarray             # [n_kept * walkers]
    acceptance: float
    rhat: np.ndarray             # [ndim] split-chain Gelman-Rubin
    n_call: int
    logz: float = float("nan")   # stepping-stone evidence (evidence=True)
    logz_err: float = float("nan")

    def posterior_indices(self, rng=None):
        """MCMC draws are already equal-weight posterior samples, so the
        posterior index set is everything — this mirrors the nested
        result's API so ``EMAnalysis.posterior_samples`` / the plotting
        helpers accept either result type."""
        return np.arange(self.logl.shape[0])


def _rhat(chain: np.ndarray) -> np.ndarray:
    """Split-chain Gelman-Rubin over walkers, [n, W, d] -> [d].

    Walkers are correlated through the ensemble move, so this is a
    stationarity diagnostic rather than an independence proof; values
    near 1 still catch unconverged burn-in reliably.
    """
    n = chain.shape[0] // 2
    if n < 2:
        return np.full(chain.shape[-1], np.nan)
    halves = np.concatenate([chain[:n], chain[n:2 * n]], axis=1)
    m = halves.shape[1]
    means = halves.mean(axis=0)                       # [m, d]
    variances = halves.var(axis=0, ddof=1)            # [m, d]
    w = variances.mean(axis=0)
    b = n * means.var(axis=0, ddof=1)
    var_post = (n - 1) / n * w + b / n
    return np.sqrt(var_post / np.maximum(w, 1e-300))


class EnsembleMCMC:
    """Batched stretch-move sampler bound to a unit-cube likelihood."""

    def __init__(self, logl_fn: Callable, ndim: int,
                 config: EnsembleMCMCConfig = EnsembleMCMCConfig()):
        if config.walkers % 2:
            raise ValueError("walkers must be even (red/black halves)")
        if config.walkers < 2 * ndim + 2:
            raise ValueError(
                f"walkers={config.walkers} too few for ndim={ndim}; "
                f"need >= {2 * ndim + 2}")
        if config.evidence and config.temps < 2:
            raise ValueError("evidence=True needs a tempering ladder "
                             "(temps >= 2)")
        self.logl_fn = logl_fn
        self.ndim = ndim
        self.config = config

    @property
    def _betas(self):
        """Geometric inverse-temperature ladder, beta_0 = 1 (cold);
        evidence mode appends an exact beta = 0 (prior) rung so the
        stepping-stone product covers the full [0, 1] path."""
        cfg = self.config
        if cfg.temps == 1:
            return jnp.ones((1,))
        frac = jnp.arange(cfg.temps) / (cfg.temps - 1)
        ladder = jnp.power(cfg.t_max, -frac)
        if cfg.evidence:
            ladder = jnp.concatenate([ladder, jnp.zeros((1,))])
        return ladder

    def _half_update(self, key, x_move, l_move, x_ref, betas):
        """Stretch-move one half against the other, all temperatures.

        x_move/x_ref [K, half, d]; the move proposals stay within each
        temperature (the ensemble-geometry of a hot chain would break a
        cold chain's affine invariance) and the acceptance uses the
        tempered posterior beta * logl.
        """
        a = self.config.stretch_a
        k_temps, half, d = x_move.shape
        k_z, k_j, k_acc = jax.random.split(key, 3)
        u = jax.random.uniform(k_z, (k_temps, half))
        z = ((a - 1.0) * u + 1.0) ** 2 / a                     # g(z)
        j = jax.random.randint(k_j, (k_temps, half), 0, half)
        ref = jnp.take_along_axis(x_ref, j[:, :, None], axis=1)
        y = ref + z[:, :, None] * (x_move - ref)               # [K, half, d]
        # the sampled cube is [eps, 1-eps]: proposals outside are rejected
        # OUTRIGHT (not clipped into range — accepting a clipped point
        # whose Hastings factor used the unclipped z breaks detailed
        # balance and piles mass on the prior boundary); the clip below
        # only shields the likelihood call on to-be-rejected rows
        eps = 1e-6
        in_cube = jnp.all((y > eps) & (y < 1.0 - eps), axis=-1)
        y_safe = jnp.clip(y, eps, 1.0 - eps)
        l_y = self.logl_fn(y_safe.reshape(-1, d)).reshape(k_temps, half)
        ln_acc = (d - 1.0) * jnp.log(z) + betas[:, None] * (l_y - l_move)
        accept = in_cube & (jnp.log(
            jax.random.uniform(k_acc, (k_temps, half))) < ln_acc)
        x_new = jnp.where(accept[:, :, None], y_safe, x_move)
        l_new = jnp.where(accept, l_y, l_move)
        return x_new, l_new, jnp.sum(accept[0])

    def _swap(self, key, x, logl, betas, odd):
        """Replica-exchange between adjacent ladder rungs.

        Alternating even/odd pairings; per-walker Metropolis swap with
        ln p = (beta_k - beta_{k+1}) (logl_{k+1} - logl_k).
        """
        k_temps, w, _ = x.shape
        if k_temps == 1:
            return x, logl
        pair_lo = jnp.arange(odd, k_temps - 1, 2)             # static
        u = jax.random.uniform(key, (pair_lo.shape[0], w))
        d_beta = betas[pair_lo] - betas[pair_lo + 1]          # [P]
        d_logl = logl[pair_lo + 1] - logl[pair_lo]            # [P, w]
        do = jnp.log(u) < d_beta[:, None] * d_logl            # [P, w]
        x_lo, x_hi = x[pair_lo], x[pair_lo + 1]
        l_lo, l_hi = logl[pair_lo], logl[pair_lo + 1]
        new_lo = jnp.where(do[:, :, None], x_hi, x_lo)
        new_hi = jnp.where(do[:, :, None], x_lo, x_hi)
        x = x.at[pair_lo].set(new_lo).at[pair_lo + 1].set(new_hi)
        logl = logl.at[pair_lo].set(jnp.where(do, l_hi, l_lo))
        logl = logl.at[pair_lo + 1].set(jnp.where(do, l_lo, l_hi))
        return x, logl

    def run(self, key=None, verbose: bool = False) -> EnsembleMCMCResult:
        cfg = self.config
        w2 = cfg.walkers // 2
        betas = self._betas
        kt = betas.shape[0]
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        k_init, k_run = jax.random.split(key)
        x0 = jax.random.uniform(k_init, (kt, cfg.walkers, self.ndim),
                                minval=1e-4, maxval=1.0 - 1e-4)
        # jit the init evaluation: an eager call would dispatch the
        # vmapped likelihood op-by-op, materialising every unfused
        # intermediate at full batch width in HBM (the GRB EATS hat
        # tensors alone are ~GBs at 256 walkers — observed
        # RESOURCE_EXHAUSTED) and taking seconds/op on remote backends
        l0 = jax.jit(self.logl_fn)(x0.reshape(-1, self.ndim)).reshape(
            kt, cfg.walkers)

        def sweep(carry, ks):
            x, logl = carry
            k1, k2, k3, k4 = jax.random.split(ks, 4)
            xa, la, na = self._half_update(
                k1, x[:, :w2], logl[:, :w2], x[:, w2:], betas)
            xb, lb, nb = self._half_update(
                k2, x[:, w2:], logl[:, w2:], xa, betas)
            x = jnp.concatenate([xa, xb], axis=1)
            logl = jnp.concatenate([la, lb], axis=1)
            x, logl = self._swap(k3, x, logl, betas, 0)
            x, logl = self._swap(k4, x, logl, betas, 1)
            return (x, logl), (x[0], logl, na + nb)

        @jax.jit
        def run_block(x, logl, block_keys):
            (x, logl), (xs_b, ls_b, na_b) = jax.lax.scan(
                sweep, (x, logl), block_keys)
            return x, logl, xs_b, ls_b, jnp.sum(na_b)

        keys = jax.random.split(k_run, cfg.sweeps)
        chunk = max(1, min(int(cfg.chunk_sweeps), cfg.sweeps))
        x, logl = x0, l0
        xs_parts, ls_parts = [], []
        n_acc = 0
        done = 0
        while done < cfg.sweeps:
            nb = min(chunk, cfg.sweeps - done)
            x, logl, xs_b, ls_b, na_b = run_block(
                x, logl, keys[done:done + nb])
            # np.asarray blocks until the dispatch completes, so at most
            # one chunk is ever in flight on the device
            xs_parts.append(np.asarray(xs_b))
            ls_parts.append(np.asarray(ls_b))
            n_acc += int(na_b)
            done += nb
            if verbose:
                print(f"ensemble-mcmc: sweep {done}/{cfg.sweeps} "
                      f"cold acceptance {n_acc / (done * cfg.walkers):.2f}",
                      flush=True)
        xs = np.concatenate(xs_parts)                       # [S, W, d]
        ls_all = np.concatenate(ls_parts)                   # [S, K, W]

        burn = int(cfg.sweeps * cfg.burn_frac)
        xs = xs[burn::cfg.thin]                             # [n, W, d]
        ls_all = ls_all[burn::cfg.thin]                     # [n, K, W]
        ls = ls_all[:, 0]                                   # cold chain
        acc = n_acc / (cfg.sweeps * cfg.walkers)
        rhat = _rhat(xs)
        logz, logz_err = (self._stepping_stone(ls_all, np.asarray(betas))
                          if cfg.evidence else (float("nan"),
                                                float("nan")))
        if verbose:
            print(f"ensemble-mcmc: {xs.shape[0]} kept sweeps x "
                  f"{cfg.walkers} walkers x {kt} temps, cold acceptance "
                  f"{acc:.2f}, max R-hat {np.nanmax(rhat):.3f}",
                  flush=True)
        return EnsembleMCMCResult(
            samples_u=xs.reshape(-1, self.ndim),
            chain_u=xs,
            logl=ls.reshape(-1),
            acceptance=acc,
            rhat=rhat,
            n_call=(int(cfg.sweeps) * cfg.walkers + cfg.walkers) * kt,
            logz=logz,
            logz_err=logz_err,
        )

    @staticmethod
    def _stepping_stone(ls_all, betas):
        """Stepping-stone evidence from the tempered chains.

        ln Z = sum_j ln E_{beta_j}[exp((beta_{j+1} - beta_j) L)] over the
        ascending ladder 0 = b_0 < ... < b_M = 1 (Xie et al. 2011); each
        expectation uses the post-burn samples of its own rung. The
        error is the block standard error over 8 sweep blocks.
        """
        order = np.argsort(betas)
        bs = betas[order]                                   # ascending
        chains = ls_all[:, order, :]                        # [n, K, W]

        def lnz_of(block):
            total = 0.0
            for j in range(len(bs) - 1):
                db = bs[j + 1] - bs[j]
                lj = block[:, j, :].ravel()
                m = lj.max()
                total += db * m + np.log(
                    np.mean(np.exp(db * (lj - m))))
            return total

        lnz = lnz_of(chains)
        n = chains.shape[0]
        n_blocks = min(8, n)
        blocks = [chains[i * n // n_blocks:(i + 1) * n // n_blocks]
                  for i in range(n_blocks)]
        vals = [lnz_of(b) for b in blocks if b.shape[0] > 0]
        err = float(np.std(vals) / np.sqrt(len(vals))) if len(vals) > 1 \
            else float("nan")
        return float(lnz), err
