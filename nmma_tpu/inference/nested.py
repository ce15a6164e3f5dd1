"""Vectorized nested sampling — the TPU-native sampler core.

Replaces the reference's external samplers (MultiNest via pymultinest
ctypes, MPI-dynesty master/worker farming — ``nmma/core/base.py:290-369``,
``nmma/core/mpi_setup.py:604-683``) with a single XLA-compiled program:

* the live set is a dense ``[nlive, ndim]`` unit-cube tensor;
* each iteration deletes the ``n_delete`` worst points at once and refills
  them with ``n_delete`` *parallel* Metropolis random-walk chains started
  from surviving live points, preconditioned by the live-set Cholesky
  factor (the batched analogue of dynesty's 'rwalk' with live-point
  bounds);
* every chain step evaluates the likelihood on the whole chain batch —
  this is the TPU throughput axis (vmap over chains; shard over a mesh
  via `nmma_tpu.parallel`);
* evidence bookkeeping follows the standard sequential-shrinkage result:
  deleting the j-th of K points from a set of n shrinks
  ln X by 1/(n - j), exactly the classic single-deletion recursion
  applied K times;
* a chunk of iterations runs under one ``lax.scan`` jit; the Python
  driver loop only checks termination, accumulates dead points host-side,
  and checkpoints (reference cadence semantics: ``check_point_delta_t``).

Proposal-scale adaptation is Robbins-Monro toward a target acceptance
rate, mirroring dynesty's rwalk tuning.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@dataclass(frozen=True)
class NestedSamplerConfig:
    nlive: int = 1024
    n_delete: int = 128          # points replaced per iteration
    walks: int = 24              # MCMC steps per replacement chain
    dlogz: float = 0.1           # evidence stopping criterion (reference default)
    target_acceptance: float = 0.40
    max_iter: int = 100_000      # outer iterations (each kills n_delete)
    chunk_size: int = 20         # iterations fused into one jitted scan
    seed: int = 42
    check_point_delta_t: float = 1800.0   # seconds (reference parsing.py:125)
    profile_dir: str = None      # capture a jax profiler trace of one chunk


class NSState(NamedTuple):
    u_live: jnp.ndarray          # [nlive, ndim]
    logl_live: jnp.ndarray       # [nlive]
    log_x: jnp.ndarray           # current prior-volume estimate (scalar)
    logz: jnp.ndarray            # accumulated evidence (scalar)
    logzvar: jnp.ndarray         # accumulated evidence variance (scalar)
    h_info: jnp.ndarray          # information (scalar)
    scale: jnp.ndarray           # rwalk proposal scale (scalar)
    n_accept: jnp.ndarray        # running acceptance counters
    n_propose: jnp.ndarray
    n_call: jnp.ndarray          # total likelihood evaluations
    it: jnp.ndarray              # iteration counter
    key: jnp.ndarray


class DeadChunk(NamedTuple):
    u: jnp.ndarray               # [chunk, K, ndim]
    logl: jnp.ndarray            # [chunk, K]
    logw: jnp.ndarray            # [chunk, K] ln(prior mass * L)
    log_x: jnp.ndarray           # [chunk, K] volume after each deletion


@dataclass
class NestedSamplerResult:
    samples_u: np.ndarray        # dead + final live points, unit cube
    logl: np.ndarray
    logw: np.ndarray             # unnormalised ln posterior weights
    logz: float
    logz_err: float
    ncall: int
    niter: int
    h_info: float
    log_x: np.ndarray

    @property
    def log_weights(self):
        return self.logw - np.logaddexp.reduce(self.logw)

    def posterior_indices(self, rng=None):
        """Rejection-sample equal-weight posterior indices
        (reference: ``rejection_sample``, nmma/core/utils.py:181-183)."""
        rng = rng or np.random.default_rng(0)
        w = np.exp(self.log_weights - self.log_weights.max())
        keep = rng.uniform(size=len(w)) < w
        return np.flatnonzero(keep)


def _volume_decrements(nlive: int, n_delete: int) -> np.ndarray:
    """ln-volume shrink per deletion: 1/(n), 1/(n-1), ..."""
    return 1.0 / (nlive - np.arange(n_delete))


class NestedSampler:
    """Batched nested sampler bound to a vectorized log-likelihood.

    Parameters
    ----------
    logl_fn : callable
        Batched likelihood ``u_batch [B, ndim] -> logl [B]`` **in the unit
        cube** (the caller composes prior transform + model + constraints).

        Sentinel contract: invalid points must return exactly ``-1e30``
        (the value used by the EM/GW likelihoods' nan/constraint
        discipline). Finite log-likelihoods must stay above ``-9.9e29`` —
        anything at or below that is treated as the invalid sentinel
        when deriving the live-contraction threshold, so a caller whose
        genuine values reach that range would silently disable the
        constrained walk. In f32 this bound is unreachable by any real
        chi-squared, so the contract only matters for exotic callers.
    ndim : int
    config : NestedSamplerConfig
    """

    def __init__(self, logl_fn: Callable, ndim: int,
                 config: NestedSamplerConfig = NestedSamplerConfig(),
                 mesh=None):
        self.logl_fn = logl_fn
        self.ndim = ndim
        self.config = config
        self.mesh = mesh
        self._decr = jnp.asarray(_volume_decrements(config.nlive,
                                                    config.n_delete))
        if mesh is not None:
            # explicit shardings: live arrays split on the batch axis,
            # everything else replicated — the jit is told the layout
            # instead of inferring it from input placement
            from ..parallel.mesh import state_shardings
            s_state = state_shardings(self, mesh)
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            s_chunk = DeadChunk(u=rep, logl=rep, logw=rep, log_x=rep)
            self._chunk_fn = jax.jit(self._run_chunk,
                                     in_shardings=(s_state,),
                                     out_shardings=(s_state, s_chunk))
        else:
            self._chunk_fn = jax.jit(self._run_chunk)

    # ------------------------------------------------------------------
    def init_state(self, key=None) -> NSState:
        cfg = self.config

        # two jitted programs, not one: fusing the threefry PRNG with the
        # likelihood into a single XLA program triggers a pathological
        # compile on the TPU toolchain (~200-600 s observed for a program
        # whose two halves compile in <5 s each). Each dispatch is still
        # a single device round trip — eager op-by-op would be seconds
        # per op on the remote backend, and eager complex ops (GW
        # likelihoods) are unimplemented there outright.
        def _draw(seed_key):
            key, sub = jax.random.split(seed_key)
            return key, jax.random.uniform(sub, (cfg.nlive, self.ndim))

        def _finish(key, u):
            logl = self.logl_fn(u)
            return NSState(
                u_live=u, logl_live=logl,
                log_x=jnp.asarray(0.0), logz=jnp.asarray(NEG_INF),
                logzvar=jnp.asarray(0.0), h_info=jnp.asarray(0.0),
                scale=jnp.asarray(1.0),
                n_accept=jnp.asarray(0.0), n_propose=jnp.asarray(0.0),
                n_call=jnp.asarray(cfg.nlive, dtype=jnp.int64
                                   if jax.config.jax_enable_x64
                                   else jnp.int32),
                it=jnp.asarray(0, dtype=jnp.int32), key=key,
            )

        if key is None:
            key = jax.random.PRNGKey(cfg.seed)
        key, u = jax.jit(_draw)(key)
        return jax.jit(_finish)(key, u)

    # ------------------------------------------------------------------
    def _replace_batch(self, key, u_live, logl_live, threshold, scale,
                       start_idx):
        """Run K parallel constrained random-walk chains; return end states."""
        cfg = self.config
        n_k = cfg.n_delete

        # live-set preconditioner: Cholesky of the unit-cube covariance
        mean = jnp.mean(u_live, axis=0)
        centred = u_live - mean
        cov = centred.T @ centred / u_live.shape[0]
        cov = cov + 1e-10 * jnp.eye(self.ndim)
        chol = jnp.linalg.cholesky(cov)

        u = u_live[start_idx]                        # [K, ndim]
        logl = logl_live[start_idx]                  # [K]
        step_norm = 2.38 / jnp.sqrt(self.ndim)

        # when the threshold is the -inf sentinel, accept anything in-cube
        # so the initial phase mixes as a prior random walk
        thresh_eff = jnp.where(threshold <= NEG_INF * 0.99, -jnp.inf,
                               threshold)
        # likelihood-plateau guard: when NO live point strictly exceeds
        # the threshold (ties over a constant-logL region, e.g. fully
        # limit-censored data), a strict '>' acceptance would reject
        # every proposal and degenerate the live set onto one point —
        # fall back to '>=' for that iteration (volume weighting stays
        # the standard approximation; cf. dynesty's plateau treatment,
        # Fowlie et al. 2021)
        plateau = ~jnp.any(logl_live > threshold)
        thresh_eff = jnp.where(plateau, jnp.nextafter(thresh_eff, -jnp.inf),
                               thresh_eff)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            chain_sharding = NamedSharding(self.mesh,
                                           P(self.mesh.axis_names[0]))
        else:
            chain_sharding = None

        def step(carry, step_key):
            u, logl, acc = carry
            z = jax.random.normal(step_key, (n_k, self.ndim))
            prop = u + scale * step_norm * (z @ chol.T)
            in_cube = jnp.all((prop > 0.0) & (prop < 1.0), axis=1)
            prop = jnp.clip(prop, 1e-7, 1.0 - 1e-7)
            if chain_sharding is not None:
                # the proposal batch is the compute axis: pin it to the
                # mesh so the likelihood fans out over all devices
                prop = jax.lax.with_sharding_constraint(prop,
                                                        chain_sharding)
            logl_prop = self.logl_fn(prop)
            ok = in_cube & (logl_prop > thresh_eff)
            u_new = jnp.where(ok[:, None], prop, u)
            logl_new = jnp.where(ok, logl_prop, logl)
            return (u_new, logl_new, acc + jnp.sum(ok)), None

        keys = jax.random.split(key, cfg.walks)
        (u, logl, acc), _ = jax.lax.scan(step, (u, logl, 0.0), keys)
        return u, logl, acc, n_k * cfg.walks

    # ------------------------------------------------------------------
    def _iteration(self, state: NSState, _):
        cfg = self.config
        n_k = cfg.n_delete

        # 1. worst K points (ascending logL): top-k of the negated values
        # instead of a full argsort — O(nlive log K) and, when the live
        # axis is sharded, a per-shard top-k + K-sized all-gather instead
        # of an all-gather of the whole live set
        neg_topk, dead_idx = jax.lax.top_k(-state.logl_live, n_k)
        dead_u = state.u_live[dead_idx]
        dead_logl = -neg_topk                         # ascending logL
        threshold = dead_logl[-1]                     # K-th smallest

        # 2. volume bookkeeping (sequential shrinkage, trapezoid weights)
        log_x_after = state.log_x - jnp.cumsum(self._decr)
        log_x_prev = jnp.concatenate([state.log_x[None], log_x_after[:-1]])
        # ln(X_prev - X_after) = log_x_prev + ln(1 - exp(-decr))
        log_dvol = log_x_prev + jnp.log(-jnp.expm1(-self._decr))
        logw = dead_logl + log_dvol

        # evidence + information updates
        logz_new = jnp.logaddexp(state.logz, jax.scipy.special.logsumexp(logw))
        # information H via the standard incremental formula
        lzterm = jnp.exp(logw - logz_new) * dead_logl
        h_new = jnp.sum(jnp.where(jnp.isfinite(lzterm), lzterm, 0.0)) + \
            jnp.exp(state.logz - logz_new) * (state.h_info + state.logz) - \
            logz_new
        h_new = jnp.where(jnp.isfinite(h_new), h_new, state.h_info)

        # evidence-variance accumulation (dynesty's recursion:
        # d var(lnZ) = 2 dH dlnX per shrinkage step, SIGNED — the
        # telescoped sum is 2 H_final dlnX and per-step f32 noise in H
        # cancels; the round-2 max(dh, 0) clamp rectified that noise and
        # inflated the reported error 6-9x over the cross-seed scatter,
        # measured in tests/test_evidence_calibration.py). While dead
        # points still carry the -1e30 sentinel, H swings by ~1e30 —
        # those transients are excluded (the classic sqrt(H/nlive)
        # fallback in _finalise covers degenerate runs).
        dh = h_new - state.h_info
        # per-DEAD-POINT volume decrement (~1/nlive): dynesty applies the
        # recursion once per dead point; a K-point chunk pairs the
        # chunk's dH with the chunk's K/nlive decrement, overcounting the
        # variance by K (round-2 bug; telescoped total is 2 H/nlive)
        dlnx = jnp.sum(self._decr) / n_k
        sane = jnp.isfinite(dh) & (jnp.abs(dh) < 1e6) & \
            (dead_logl[0] > NEG_INF * 0.99)
        logzvar_new = state.logzvar + jnp.where(
            sane, 2.0 * dh * dlnx, 0.0)

        # 3. refill via constrained random walks from surviving points.
        # Without the full sort order, survivors are found by drawing
        # uniform indices and re-drawing (twice) on collision with a dead
        # point; the argmax point is the always-valid fallback (collision
        # probability after two redraws: (K/nlive)^3).
        key, k_start, k_walk = jax.random.split(state.key, 3)
        draws = jax.random.randint(k_start, (3, n_k), 0, cfg.nlive)
        alive = state.logl_live > threshold
        # plateau guard (see _replace_batch): with ties at the threshold
        # and nothing strictly above, start chains from the tied set
        # instead of collapsing every chain onto the single argmax point
        alive = jnp.where(jnp.any(alive), alive,
                          state.logl_live >= threshold)
        best = jnp.argmax(state.logl_live)
        start = jnp.full((n_k,), best)
        for attempt in (2, 1, 0):
            cand = draws[attempt]
            start = jnp.where(alive[cand], cand, start)
        u_new, logl_new, acc, n_prop = self._replace_batch(
            k_walk, state.u_live, state.logl_live, threshold, state.scale,
            start)

        u_live = state.u_live.at[dead_idx].set(u_new)
        logl_live = state.logl_live.at[dead_idx].set(logl_new)

        # 4. Robbins-Monro scale adaptation toward target acceptance
        acc_rate = acc / n_prop
        lr = 1.0 / jnp.sqrt(1.0 + state.it.astype(jnp.float32))
        new_scale = state.scale * jnp.exp(
            lr * (acc_rate - cfg.target_acceptance))
        new_scale = jnp.clip(new_scale, 1e-4, 10.0)

        new_state = NSState(
            u_live=u_live, logl_live=logl_live,
            log_x=log_x_after[-1], logz=logz_new,
            logzvar=logzvar_new, h_info=h_new,
            scale=new_scale,
            n_accept=state.n_accept + acc,
            n_propose=state.n_propose + n_prop,
            n_call=state.n_call + n_prop,
            it=state.it + 1, key=key,
        )
        chunk = DeadChunk(u=dead_u, logl=dead_logl, logw=logw,
                          log_x=log_x_after)
        return new_state, chunk

    def _run_chunk(self, state: NSState):
        return jax.lax.scan(self._iteration, state, None,
                            length=self.config.chunk_size)

    # ------------------------------------------------------------------
    def run(self, key=None, state=None, verbose=True,
            checkpoint_path=None, resume=False) -> NestedSamplerResult:
        cfg = self.config
        dead_u, dead_logl, dead_logw, dead_logx = [], [], [], []

        # preemption handling: SIGTERM/SIGINT/SIGUSR1 -> checkpoint + exit
        # (reference signal discipline, nmma/core/mpi_setup.py:639-649)
        interrupted = {"flag": False}
        old_handlers = {}
        if checkpoint_path is not None:
            import signal

            def _handler(signum, frame):
                interrupted["flag"] = True

            for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGUSR1):
                try:
                    old_handlers[sig] = signal.signal(sig, _handler)
                except (ValueError, OSError):
                    pass

        if resume and checkpoint_path is not None:
            loaded = self.load_checkpoint(checkpoint_path)
            if loaded is not None:
                state, dead = loaded
                dead_u, dead_logl, dead_logw, dead_logx = dead

        if state is None:
            state = self.init_state(key)

        try:
            return self._run_loop(state, dead_u, dead_logl, dead_logw,
                                  dead_logx, checkpoint_path, interrupted,
                                  verbose)
        finally:
            # restore the original handlers even when the loop raises
            # (a leaked no-op handler silently swallows later Ctrl-C in
            # the same process)
            if old_handlers:
                import signal
                for sig, handler in old_handlers.items():
                    signal.signal(sig, handler)

    def _run_loop(self, state, dead_u, dead_logl, dead_logw, dead_logx,
                  checkpoint_path, interrupted, verbose):
        cfg = self.config
        t_last_ckpt = time.time()
        t_run0 = time.time()
        cur_it = int(jax.device_get(state.it))
        ncall_0 = int(jax.device_get(state.n_call))
        profiled = False
        while cur_it < cfg.max_iter:
            if cfg.profile_dir and not profiled and cur_it > 0:
                # profile the second chunk (first carries compile)
                with jax.profiler.trace(cfg.profile_dir):
                    state, chunk = self._chunk_fn(state)
                    jax.block_until_ready(state.logz)
                profiled = True
            else:
                state, chunk = self._chunk_fn(state)
            # one bulk device->host transfer per chunk: per-field pulls and
            # eager reductions are each a separate round trip on the axon
            # remote backend
            h_state, h_chunk = jax.device_get((state, chunk))
            dead_u.append(np.asarray(h_chunk.u).reshape(-1, self.ndim))
            dead_logl.append(np.asarray(h_chunk.logl).ravel())
            dead_logw.append(np.asarray(h_chunk.logw).ravel())
            dead_logx.append(np.asarray(h_chunk.log_x).ravel())

            logz = float(h_state.logz)
            logz_remain = float(np.max(h_state.logl_live)) \
                + float(h_state.log_x)
            dlogz = float(np.logaddexp(logz, logz_remain) - logz)
            if verbose:
                eff = float(h_state.n_accept) / max(
                    float(h_state.n_propose), 1.0)
                rate = (int(h_state.n_call) - ncall_0) / max(
                    time.time() - t_run0, 1e-9)
                print(f"it={int(h_state.it):6d} "
                      f"ncall={int(h_state.n_call):9d} "
                      f"logz={logz:10.3f} dlogz={dlogz:8.4f} "
                      f"eff={eff:5.3f} scale={float(h_state.scale):7.4f} "
                      f"evals/s={rate:8.0f}",
                      flush=True)
            cur_it = int(h_state.it)
            if checkpoint_path is not None and \
                    (interrupted["flag"] or
                     time.time() - t_last_ckpt > cfg.check_point_delta_t):
                self.save_checkpoint(checkpoint_path, state,
                                     (dead_u, dead_logl, dead_logw, dead_logx))
                t_last_ckpt = time.time()
            if interrupted["flag"]:
                print("interrupt received: checkpoint written, exiting run "
                      "loop (resume with resume=True)", flush=True)
                break
            if dlogz < cfg.dlogz:
                break
            if cur_it >= cfg.max_iter:
                break

        return self._finalise(state, dead_u, dead_logl, dead_logw, dead_logx)

    # ------------------------------------------------------------------
    def _finalise(self, state, dead_u, dead_logl, dead_logw, dead_logx):
        cfg = self.config
        # final live points: uniform volume assignment X_final/nlive each
        u_live = np.asarray(state.u_live)
        logl_live = np.asarray(state.logl_live)
        order = np.argsort(logl_live)
        log_x_final = float(state.log_x)
        live_logw = logl_live[order] + log_x_final - np.log(cfg.nlive)
        live_logx = np.full(cfg.nlive, log_x_final)

        samples_u = np.concatenate(dead_u + [u_live[order]], axis=0)
        logl = np.concatenate(dead_logl + [logl_live[order]])
        logw = np.concatenate(dead_logw + [live_logw])
        logx = np.concatenate(dead_logx + [live_logx])

        logz = float(np.logaddexp.reduce(logw))
        h = float(state.h_info)
        # accumulated dynesty-style variance; classic sqrt(H/nlive) as the
        # fallback when the recursion is degenerate
        lzvar = float(state.logzvar)
        if np.isfinite(lzvar) and lzvar > 0.0:
            logz_err = float(np.sqrt(lzvar))
        else:
            logz_err = float(np.sqrt(max(h, 0.0) / cfg.nlive))
        return NestedSamplerResult(
            samples_u=samples_u, logl=logl, logw=logw, logz=logz,
            logz_err=logz_err, ncall=int(state.n_call),
            niter=int(state.it), h_info=h, log_x=logx,
        )

    # ------------------------------------------------------------------
    def save_checkpoint(self, path, state: NSState, dead):
        dead_u, dead_logl, dead_logw, dead_logx = dead
        arrays = {f"state_{i}": np.asarray(x) for i, x in enumerate(state)}
        np.savez(
            str(path) + ".tmp.npz",
            **arrays,
            dead_u=np.concatenate(dead_u) if dead_u else np.zeros((0, self.ndim)),
            dead_logl=np.concatenate(dead_logl) if dead_logl else np.zeros(0),
            dead_logw=np.concatenate(dead_logw) if dead_logw else np.zeros(0),
            dead_logx=np.concatenate(dead_logx) if dead_logx else np.zeros(0),
        )
        import os
        os.replace(str(path) + ".tmp.npz", str(path))

    def load_checkpoint(self, path):
        import os
        if not os.path.exists(path):
            return None
        z = np.load(path)
        fields = [jnp.asarray(z[f"state_{i}"]) for i in range(len(NSState._fields))]
        state = NSState(*fields)
        dead = ([z["dead_u"]], [z["dead_logl"]], [z["dead_logw"]],
                [z["dead_logx"]])
        return state, dead
