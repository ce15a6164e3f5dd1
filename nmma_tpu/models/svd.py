"""SVD light-curve surrogates: batched MLP + projection eval on the MXU.

TPU-native re-design of ``SVDLightCurveModel`` + ``eval_svd_model``
(``nmma/em/model.py:535-731``, ``nmma/em/lightcurve_generation.py:142-217``).
The reference evaluates one keras MLP per filter per likelihood call
(single-theta, dict-of-filters); here all per-filter networks are stacked
into `[F, ...]` weight tensors so one einsum chain evaluates *every filter
for every live point at once*:

    x  = (theta - pmin) / (pmax - pmin)              [B, P]
    h  = relu(x . W1[f] + b1[f])                     [B, F, H]
    c  = h . W2[f] + b2[f]                           [B, F, C]
    m  = VA[f] . c[f] * (maxs - mins) + mins         [B, F, T_svd]

— three MXU matmuls, no per-filter Python. The result is interpolated
onto the requested sample times with inf outside the trained range
(reference ``calc_svd_lc`` :147-178).

Model data lives in an .npz of plain arrays (our format) and can also be
ingested from the reference's artifacts (joblib core + per-filter
keras/h5 weights) via ``ingest_nmma_svd_model``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import masked_interp_sorted_fill
from .base import SourceModel, register_source_model


@dataclass(frozen=True)
class SVDModelData:
    """Stacked surrogate tensors for one model family."""

    filters: tuple            # F filter names
    parameter_names: tuple    # P parameter names
    tt: np.ndarray            # [T] surrogate time grid (days)
    va: np.ndarray            # [F, T, C]
    mins: np.ndarray          # [F, T]
    maxs: np.ndarray          # [F, T]
    param_mins: np.ndarray    # [P]
    param_maxs: np.ndarray    # [P]
    w1: np.ndarray            # [F, P, H]
    b1: np.ndarray            # [F, H]
    w2: np.ndarray            # [F, H, C]
    b2: np.ndarray            # [F, C]

    @property
    def n_coeff(self):
        return self.va.shape[-1]

    def save(self, path):
        np.savez_compressed(
            path, tt=self.tt, va=self.va, mins=self.mins, maxs=self.maxs,
            param_mins=self.param_mins, param_maxs=self.param_maxs,
            w1=self.w1, b1=self.b1, w2=self.w2, b2=self.b2,
            filters=np.asarray(self.filters),
            parameter_names=np.asarray(self.parameter_names))

    @classmethod
    def load(cls, path):
        z = np.load(path, allow_pickle=False)
        return cls(
            filters=tuple(str(f) for f in z["filters"]),
            parameter_names=tuple(str(p) for p in z["parameter_names"]),
            tt=z["tt"], va=z["va"], mins=z["mins"], maxs=z["maxs"],
            param_mins=z["param_mins"], param_maxs=z["param_maxs"],
            w1=z["w1"], b1=z["b1"], w2=z["w2"], b2=z["b2"])


class _SVDFastEval:
    """Fused surrogate evaluator: the MLP output layer, SVD basis
    reconstruction, min-max denormalisation, and interpolation onto a
    *static* time grid are all linear in the hidden activations, so they
    fold into ONE precomputed block-diagonal operator

        mags[f, q] = relu(x . W1_flat)[f*H:(f+1)*H] . W_out + offset

    — two dense matmuls per call that vmap into [B, P] @ [P, F*H] and
    [B, F*H] @ [F*H, F*Q] (clean MXU shapes; the einsum formulation this
    replaces lowered to batch-middle dot_generals ~30x slower on TPU).
    """

    def __init__(self, svd: SVDModelData, mag_ncoeff=None):
        n_c = svd.n_coeff if mag_ncoeff is None else min(mag_ncoeff,
                                                         svd.n_coeff)
        f, t, _ = svd.va.shape
        p, h = svd.w1.shape[1:]
        self.F, self.H = f, h
        # keep everything as host numpy: values created with jnp inside a
        # trace would be staged as tracers and leak through the cache
        self.param_mins = np.asarray(svd.param_mins, dtype=np.float32)
        self.param_maxs = np.asarray(svd.param_maxs, dtype=np.float32)
        # zero-span guard: a parameter constant across the training grid
        # (e.g. LANL KNtheta=0) must normalize to 0, not 0/0 = NaN —
        # mirrors training.svd.normalize_params
        self._p_span = np.where(self.param_maxs > self.param_mins,
                                self.param_maxs - self.param_mins,
                                np.float32(1.0))
        self.parameter_names = svd.parameter_names
        self.w1_flat = np.ascontiguousarray(
            svd.w1.transpose(1, 0, 2)).reshape(p, f * h).astype(np.float32)
        self.b1_flat = np.asarray(svd.b1.reshape(f * h), dtype=np.float32)
        va = np.asarray(svd.va[..., :n_c], dtype=np.float64)
        w2 = np.asarray(svd.w2[..., :n_c], dtype=np.float64)
        b2 = np.asarray(svd.b2[..., :n_c], dtype=np.float64)
        scale = np.asarray(svd.maxs - svd.mins, dtype=np.float64)
        # output operator with denorm folded in: m = h . vtw + voff [F,T]
        self._vtw = np.einsum("fhc,ftc->fht", w2, va) * scale[:, None, :]
        self._voff = np.einsum("fc,ftc->ft", b2, va) * scale + svd.mins
        # rank-C factors: m = (h . w2 + b2) . (scale*va interp) + mins
        self._w2c = w2.astype(np.float32)                     # [F, H, C]
        self._b2c = b2.astype(np.float32)                     # [F, C]
        self._va_scaled = va * scale[:, :, None]              # [F, T, C]
        self._mins = np.asarray(svd.mins, dtype=np.float64)   # [F, T]
        self._w1_stack = np.asarray(svd.w1, dtype=np.float32)  # [F, P, H]
        self._b1_stack = np.asarray(svd.b1, dtype=np.float32)  # [F, H]
        self._grid = np.asarray(svd.tt, dtype=np.float64)
        self._ops = {}

    def _interp_weights(self, t_days):
        """Hat-basis interpolation matrix wi [T, Q] + inside mask [Q]
        for a static output grid."""
        tq = np.asarray(t_days, dtype=np.float64)
        grid = self._grid
        t = len(grid)
        q = len(tq)
        pos = np.clip(np.searchsorted(grid, tq, side="right") - 1, 0, t - 2)
        frac = (tq - grid[pos]) / (grid[pos + 1] - grid[pos])
        wi = np.zeros((t, q))
        np.add.at(wi, (pos, np.arange(q)), 1.0 - frac)
        np.add.at(wi, (pos + 1, np.arange(q)), frac)
        inside = (tq >= grid[0]) & (tq <= grid[-1])
        return wi, inside

    def operator_batched(self, t_days):
        """(vtw_q [F, H, Q], offset [F, Q], inside [Q]) for a static grid:
        the per-filter output blocks, interp folded in."""
        tq = np.asarray(t_days, dtype=np.float64)
        key = (tq.shape, tq.tobytes())
        hit = self._ops.get(key)
        if hit is not None:
            return hit
        wi, inside = self._interp_weights(tq)
        vtw_q = np.einsum("fht,tq->fhq", self._vtw, wi).astype(np.float32)
        off_q = (self._voff @ wi).astype(np.float32)
        entry = (vtw_q, off_q, inside)
        self._ops[key] = entry
        return entry

    def operator_rankc(self, t_days):
        """(va_q [F, C, Q], offset [F, Q], inside [Q]): the output
        operator kept FACTORED through the C-dim SVD bottleneck —
        m[f, q] = (h . w2 + b2)[f, :] . va_q[f] + off_q[f]. At
        production dims (H=2048, C=10, Q=150) this is ~10x fewer FLOPs
        than contracting the folded [F, H, Q] operator, and the batched
        eval keeps the hidden activations in a [F, B, H] layout so XLA
        emits filter-batched dots with no 36-MiB relayout transposes
        (both showed up in the compiled headline-bench HLO)."""
        tq = np.asarray(t_days, dtype=np.float64)
        key = ("rankc", tq.shape, tq.tobytes())
        hit = self._ops.get(key)
        if hit is not None:
            return hit
        wi, inside = self._interp_weights(tq)
        va_q = np.einsum("ftc,tq->fcq", self._va_scaled,
                         wi).astype(np.float32)
        off_q = (self._mins @ wi).astype(np.float32)
        entry = (va_q, off_q, inside)
        self._ops[key] = entry
        return entry

    def operator(self, t_days):
        """(W [F*H, F*Q], offset [F*Q], inside [Q]): the batched blocks
        assembled into one dense block-diagonal operator."""
        key = ("dense", np.asarray(t_days, dtype=np.float64).tobytes())
        hit = self._ops.get(key)
        if hit is not None:
            return hit
        vtw_q, off_q, inside = self.operator_batched(t_days)
        f, h = self.F, self.H
        q = len(inside)
        w_out = np.zeros((f * h, f * q), dtype=np.float32)
        for fi in range(f):
            w_out[fi * h:(fi + 1) * h, fi * q:(fi + 1) * q] = vtw_q[fi]
        entry = (w_out, off_q.reshape(f * q), inside)
        self._ops[key] = entry
        return entry

    def _rankc_fn(self, t_days):
        """custom-vmap eval for the factored operator: x [P] -> m [F, Q].

        The batched rule lays the hidden activations out as [F, B, H] so
        both MLP dots are clean filter-batched dot_generals — under plain
        ``vmap`` XLA relayouts the [B, F*H] activation twice (36 MiB each
        at the headline-bench dims) to feed the filter-batched output
        contraction."""
        va_q, off_q, inside = self.operator_rankc(t_days)
        key = ("rankc_fn", va_q.shape, off_q.tobytes())
        hit = self._ops.get(key)
        if hit is not None:
            return hit
        w1, b1 = self._w1_stack, self._b1_stack
        w2c, b2c = self._w2c, self._b2c
        f = self.F

        @jax.custom_batching.custom_vmap
        def core(x):
            hid = jax.nn.relu(jnp.einsum("p,fph->fh", x, w1) + b1)
            c = jnp.einsum("fh,fhc->fc", hid, w2c) + b2c        # [F, C]
            return jnp.einsum("fc,fcq->fq", c, va_q) + off_q    # [F, Q]

        @core.def_vmap
        def core_vmap(axis_size, in_batched, x):
            if not in_batched[0]:
                return core(x), False
            # NMMA_TPU_SVD_PALLAS=1 routes a live-point batch on TPU
            # through the Pallas kernel, which keeps the [B, F, H]
            # hidden activations in VMEM. Measured on the v5e at the
            # production headline dims (B=8192, H=2048): the XLA rankc
            # form wins, 1.44-1.50M evals/s vs 1.37-1.42M for the
            # kernel, consistent across 3 best-of-5 runs — XLA's fused
            # lowering of the three small einsums is already
            # activation-resident enough here, so (unlike Me2017/GRB)
            # the kernel is opt-in rather than the TPU default.
            if (jax.default_backend() == "tpu"
                    and os.environ.get("NMMA_TPU_SVD_PALLAS")
                    and not os.environ.get("NMMA_TPU_DISABLE_PALLAS")):
                from ..ops.pallas_svd import svd_surrogate_mags_pallas
                return svd_surrogate_mags_pallas(
                    x, w1, b1, w2c, b2c, va_q, off_q), True     # [B, F, Q]
            xb = jnp.broadcast_to(x[None], (f,) + x.shape)      # [F, B, P]
            hid = jax.nn.relu(jnp.einsum("fbp,fph->fbh", xb, w1)
                              + b1[:, None, :])                 # [F, B, H]
            c = jnp.einsum("fbh,fhc->fbc", hid, w2c) + b2c[:, None, :]
            m = jnp.einsum("fbc,fcq->fbq", c, va_q) + off_q[:, None, :]
            return m.transpose(1, 0, 2), True                   # [B, F, Q]

        entry = (core, inside)
        self._ops[key] = entry
        return entry

    def __call__(self, params, t_days):
        theta = jnp.stack([jnp.asarray(params[p])
                           for p in self.parameter_names])
        x = (theta - self.param_mins) / self._p_span
        # Three output-operator forms with identical math:
        #  - "dense": one [F*H, F*Q] block-diagonal matmul. Wins at small
        #    H (one big MXU op vs F launch-bound slivers; measured ~30x
        #    over the batch-middle einsum at H=128).
        #  - "batched": per-filter [H, Q] blocks contracted as a batched
        #    matmul over the FOLDED [F, H, Q] operator.
        #  - "rankc": the operator kept factored through the C-dim SVD
        #    bottleneck with a [F, B, H]-native batched layout — ~10x
        #    fewer FLOPs and no activation relayouts at production dims.
        # NMMA_TPU_SVD_EVAL=dense|batched|rankc overrides the heuristic.
        mode = os.environ.get("NMMA_TPU_SVD_EVAL", "auto")
        if mode == "auto":
            mode = "rankc" if self.H >= 1024 else "dense"
        if mode == "rankc":
            core, inside = self._rankc_fn(t_days)
            m = core(x)                                          # [F, Q]
        elif mode == "batched":
            vtw_q, off_q, inside = self.operator_batched(t_days)
            hid = jax.nn.relu(x @ self.w1_flat + self.b1_flat)   # [F*H]
            m = jnp.einsum("fh,fhq->fq", hid.reshape(self.F, self.H),
                           vtw_q) + off_q                        # [F, Q]
        else:
            w_out, offset, inside = self.operator(t_days)
            hid = jax.nn.relu(x @ self.w1_flat + self.b1_flat)   # [F*H]
            m = (hid @ w_out + offset).reshape(self.F, -1)       # [F, Q]
        # beyond the trained time range the surrogate is not trusted:
        # inf fill (reference FIXME at lightcurve_generation.py:174-176)
        return jnp.where(inside[None, :], m, jnp.inf)


_FAST_EVALS: dict = {}


def _fast_eval(svd: SVDModelData, mag_ncoeff=None) -> _SVDFastEval:
    key = (id(svd), mag_ncoeff)
    entry = _FAST_EVALS.get(key)
    # the cached entry keeps `svd` alive, so the id cannot be recycled
    if entry is None or entry[0] is not svd:
        entry = (svd, _SVDFastEval(svd, mag_ncoeff))
        _FAST_EVALS[key] = entry
    return entry[1]


def svd_surrogate_mags(svd: SVDModelData, params, t_days, mag_ncoeff=None):
    """Evaluate the stacked surrogate -> [F, T_out] absolute magnitudes.

    Fast path: static (concrete) ``t_days`` uses the fused block-diagonal
    operator. Traced ``t_days`` (per-sample detector-frame grids) falls
    back to the masked-interpolation formulation.
    """
    try:
        return _fast_eval(svd, mag_ncoeff)(params, t_days)
    except jax.errors.TracerArrayConversionError:
        pass

    theta = jnp.stack([jnp.asarray(params[p]) for p in svd.parameter_names])
    p_span = np.where(svd.param_maxs > svd.param_mins,
                      svd.param_maxs - svd.param_mins, 1.0)
    x = (theta - svd.param_mins) / p_span                             # [P]

    n_c = svd.n_coeff if mag_ncoeff is None else min(mag_ncoeff, svd.n_coeff)
    w2 = svd.w2[..., :n_c]
    b2 = svd.b2[..., :n_c]
    va = svd.va[..., :n_c]

    h = jax.nn.relu(jnp.einsum("p,fph->fh", x, jnp.asarray(svd.w1)) +
                    svd.b1)                                     # [F, H]
    c = jnp.einsum("fh,fhc->fc", h, jnp.asarray(w2)) + b2       # [F, C]
    m = jnp.einsum("ftc,fc->ft", jnp.asarray(va), c)            # [F, T_svd]
    m = m * (svd.maxs - svd.mins) + svd.mins

    def interp_one(row):
        return masked_interp_sorted_fill(t_days, jnp.asarray(svd.tt), row,
                                         jnp.inf)
    return jax.vmap(interp_one)(m)


def make_svd_source_model(name: str, svd: SVDModelData,
                          mag_ncoeff=None) -> SourceModel:
    def mags_fn(params, t_days, nu_host):
        return svd_surrogate_mags(svd, params, t_days, mag_ncoeff)

    model = SourceModel(
        name=name,
        parameter_names=tuple(svd.parameter_names),
        mags_fn=mags_fn,
        default_time_grid=lambda: np.asarray(svd.tt),
        citation="SVD surrogate (nmma-compatible)",
        filter_names=tuple(svd.filters),
    )
    register_source_model(model)
    return model


# ---------------------------------------------------------------------------
# Ingestion of reference-format artifacts
# ---------------------------------------------------------------------------
def _read_keras_h5_dense_stack(path):
    """Extract (W1, b1, W2, b2) from a legacy keras Sequential .h5 file.

    The reference's '_tf' models are Dense(P->H, relu) [+Dropout] ->
    Dense(H->C) (nmma/em/training.py:336-397); only the weights are needed
    — parsed directly with h5py, no tensorflow dependency.
    """
    import h5py
    with h5py.File(path, "r") as f:
        g = f["model_weights"]
        dense_names = sorted(
            (k for k in g.keys() if "dense" in k),
            key=lambda k: int(k.split("_")[-1]) if k.split("_")[-1].isdigit()
            else 0)
        mats = []
        for name in dense_names:
            sub = g[name]
            # descend to the weight datasets
            while not any(k.endswith(":0") for k in sub.keys()):
                sub = sub[list(sub.keys())[0]]
            kernel = np.asarray(sub["kernel:0"])
            bias = np.asarray(sub["bias:0"])
            mats.append((kernel, bias))
    if len(mats) != 2:
        raise ValueError(f"expected 2 dense layers in {path}, got {len(mats)}")
    (w1, b1), (w2, b2) = mats
    return w1, b1, w2, b2


def ingest_nmma_svd_model(model_dir, model_name, filters=None,
                          filter_dir=None):
    """Convert a reference svdmodel directory into ``SVDModelData``.

    Expects the reference layout: ``{model_name}.joblib`` core (VA, mins,
    maxs, tt, param bounds per filter; nmma/em/training.py:291-299) +
    per-filter ``{filt}.h5`` / ``{filt}.keras`` MLP weights. The per-filter
    pieces are stacked into the dense [F, ...] tensors our kernel wants.

    ``filter_dir`` overrides where the per-filter weight files live — the
    registry download layout (core/gitlab.py:225-232) puts the core at
    ``{home}/{core_name}.joblib`` but the weights under
    ``{home}/{model_name}/``.
    """
    import joblib
    core_path = os.path.join(model_dir, f"{model_name}.joblib")
    core = joblib.load(core_path)
    if filter_dir is None:
        filter_dir = model_dir
    if filters is None:
        filters = list(core.keys())

    tt = np.asarray(core[filters[0]]["tt"])
    va, mins, maxs, w1s, b1s, w2s, b2s = [], [], [], [], [], [], []
    n_coeff = min(int(core[f]["n_coeff"]) for f in filters)
    for f in filters:
        sub = core[f]
        va.append(np.asarray(sub["VA"])[:, :n_coeff])
        mins.append(np.asarray(sub["mins"]))
        maxs.append(np.asarray(sub["maxs"]))
        for ext in (".h5", ".keras"):
            path = os.path.join(filter_dir, f + ext)
            if os.path.exists(path):
                break
        w1, b1, w2, b2 = _read_keras_h5_dense_stack(path)
        w1s.append(w1)
        b1s.append(b1)
        w2s.append(w2[:, :n_coeff])
        b2s.append(b2[:n_coeff])

    first = core[filters[0]]
    return SVDModelData(
        filters=tuple(filters),
        parameter_names=tuple(first.get("model_parameters", ())) or None,
        tt=tt, va=np.stack(va), mins=np.stack(mins), maxs=np.stack(maxs),
        param_mins=np.asarray(first["param_mins"]),
        param_maxs=np.asarray(first["param_maxs"]),
        w1=np.stack(w1s), b1=np.stack(b1s), w2=np.stack(w2s),
        b2=np.stack(b2s))
