"""Reduced-order quadrature (ROQ) GW likelihood, with basis construction.

Counterpart of the reference's ``ROQGravitationalWaveTransient`` option
(``nmma/gw/gw_likelihood.py:164-207`` + ``roq_likelihood_kwargs:57-95``,
which consume externally-built LAL ROQ basis files). Those basis
artifacts are unavailable offline, so this module also provides the
*construction*: a reduced basis from prior-drawn training waveforms
(truncated SVD) with empirical-interpolation (EIM) nodes, for both the
linear <d|h> term and the quadratic <h|h> term.

At runtime the likelihood evaluates the waveform only at the ~m EIM
nodes (m ~ 30-100 versus 10^4-10^5 frequency samples) and contracts with
precomputed weights:

    <d|h>  ~= sum_k w_k h(F_k)         w = (A^-1)^T b,  b_j = 4 df sum_f d* B_j / S
    <h|h>  ~= sum_k v_k |h(G_k)|^2     (same construction on |h|^2 training data)

— one tiny dense matmul per sample on the MXU, vmappable over live
points. Construction is host-side float64; geocent-time support via the
standard per-node phase rotation at a fixed reference time (weights are
built at the trigger; small time offsets ride through the waveform's own
linear phase like relative binning).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .likelihood import project_signal
from .waveforms import taylorf2_tidal


def _empirical_interpolation(basis):
    """Greedy EIM node selection. basis [n, F] (rows orthonormal-ish).

    Returns (nodes [n], interpolant matrix A [n, n] with
    A[i, j] = basis_j(F_i))."""
    n, _ = basis.shape
    nodes = [int(np.argmax(np.abs(basis[0])))]
    for i in range(1, n):
        sub = basis[:i][:, nodes]                       # [i, i]
        coeff = np.linalg.solve(sub.T, basis[i][nodes])  # interpolate e_i
        resid = basis[i] - coeff @ basis[:i]
        nodes.append(int(np.argmax(np.abs(resid))))
    nodes = np.asarray(nodes)
    a_mat = basis[:, nodes].T                           # [n, n]
    return nodes, a_mat


def _reduced_basis(training, tol):
    """Truncated SVD basis of the training rows: keep modes with
    singular value >= tol * s_max (an energy criterion drowns in the
    f32-noise tail of the training waveforms)."""
    _, s, vh = np.linalg.svd(training, full_matrices=False)
    n_keep = int(np.sum(s >= tol * s[0]))
    n_keep = min(max(n_keep, 2), len(s))
    return vh[:n_keep]


class ROQBasis:
    """Linear + quadratic reduced bases with EIM nodes for one frequency
    grid (shared across interferometers with identical grids)."""

    def __init__(self, frequencies, lin_basis, lin_nodes, lin_a,
                 quad_basis, quad_nodes, quad_a):
        self.frequencies = np.asarray(frequencies)
        self.lin_basis = lin_basis          # [m, F] complex
        self.lin_nodes = lin_nodes          # [m]
        self.lin_a = lin_a                  # [m, m]
        self.quad_basis = quad_basis        # [q, F] real
        self.quad_nodes = quad_nodes        # [q]
        self.quad_a = quad_a                # [q, q]

    @property
    def n_lin(self):
        return len(self.lin_nodes)

    @property
    def n_quad(self):
        return len(self.quad_nodes)

    def save(self, path):
        np.savez_compressed(
            path, frequencies=self.frequencies,
            lin_basis_re=self.lin_basis.real,
            lin_basis_im=self.lin_basis.imag,
            lin_nodes=self.lin_nodes, lin_a_re=self.lin_a.real,
            lin_a_im=self.lin_a.imag, quad_basis=self.quad_basis,
            quad_nodes=self.quad_nodes, quad_a=self.quad_a)

    @classmethod
    def load(cls, path):
        z = np.load(path)
        return cls(z["frequencies"],
                   z["lin_basis_re"] + 1j * z["lin_basis_im"],
                   z["lin_nodes"], z["lin_a_re"] + 1j * z["lin_a_im"],
                   z["quad_basis"], z["quad_nodes"], z["quad_a"])


def build_roq_bases(interferometers, waveform, priors, trigger_time,
                    n_training=512, tol=1e-5, seed=0, transform=None):
    """Per-interferometer bases: {ifo_name: ROQBasis}.

    The training waveforms MUST be the exact runtime quantity — the
    detector-projected strain at the analysis trigger time. Each
    detector's response multiplies the source waveform by a constant and
    a time-delay phase ramp (tens of radians across the band), which an
    unprojected or wrong-trigger basis cannot represent.
    """
    return {ifo.name: build_roq_basis(
        ifo.frequencies, waveform, priors, n_training=n_training, tol=tol,
        seed=seed, transform=transform, detector=ifo.detector,
        trigger_time=trigger_time) for ifo in interferometers}


def build_roq_basis(frequencies, waveform, priors, n_training=512,
                    tol=1e-5, seed=0, transform=None, detector=None,
                    trigger_time=0.0):
    """Construct an :class:`ROQBasis` from prior-drawn training waveforms.

    The training set is h(f; theta) (projected onto ``detector`` when
    given, plain h_plus otherwise) for ``n_training`` prior draws;
    waveforms are evaluated through the jitted batched path. For
    likelihood use, build per-detector bases at the analysis trigger
    via :func:`build_roq_bases`.
    """
    freqs = np.asarray(frequencies, dtype=np.float64)

    def one(u_row):
        params = priors.transform(u_row)
        if transform is not None:
            params = transform(params)
        if detector is not None:
            return project_signal(detector, waveform, freqs, params,
                                  trigger_time)
        h_p, _ = waveform(freqs, params)
        return h_p

    # IMPORTANT: training runs through the SAME f32 evaluation path as
    # the runtime likelihood. An f64 training set looks cleaner but
    # produces a *different* waveform manifold — e.g. the f32 GPS/GMST
    # quantization (eps ~ 1 min at 1.2e9 s) shifts the detector phases
    # by O(rad), so runtime waveforms fall outside an f64-trained basis.
    key = jax.random.PRNGKey(seed)
    u = priors.sample_units(key, n_training)
    batched = jax.jit(jax.vmap(one))
    from .likelihood import _to_host_complex
    # pad the final batch to the fixed 128 shape: a ragged last batch
    # retraces/recompiles the whole projected-waveform graph (cold
    # compiles cost minutes on the remote backend)
    n_pad = (-n_training) % 128
    u_pad = np.concatenate([u, u[:1].repeat(n_pad, axis=0)]) if n_pad \
        else u
    rows = []
    for i in range(0, len(u_pad), 128):
        rows.append(_to_host_complex(batched(jnp.asarray(u_pad[i:i + 128]))))
    training = np.concatenate(rows)[:n_training]         # [N, F] complex

    # normalize rows so the basis resolves shape, not amplitude
    norms = np.linalg.norm(training, axis=1, keepdims=True)
    training = training / np.maximum(norms, 1e-300)

    # hold out rows for mode-count selection by cross-validation: the
    # singular spectrum alone cannot separate real modes from the f32
    # evaluation-noise floor, but the EIM residual on held-out waveforms
    # measures exactly the quantity the likelihood error depends on
    n_hold = max(n_training // 8, 8)
    holdout, train = training[:n_hold], training[n_hold:]

    lin_basis, lin_nodes, lin_a = _cross_validated_basis(
        train, holdout, tol)
    quad_basis, quad_nodes, quad_a = _cross_validated_basis(
        np.abs(train) ** 2, np.abs(holdout) ** 2, tol)

    return ROQBasis(freqs, lin_basis, lin_nodes, lin_a, quad_basis,
                    quad_nodes, quad_a)


def _cross_validated_basis(train, holdout, tol, target_resid=1e-3,
                           max_cond=100.0, n_cap=192):
    """Pick the smallest mode count whose worst held-out EIM residual
    beats ``target_resid``; fall back to the best-achieved count.

    The search is restricted to compact, well-conditioned interpolants:
    past the true manifold dimension the SVD modes are f32 evaluation
    noise, and although such bases can look fine on held-out *training*
    rows, they amplify the independent noise of fresh waveforms through
    the nodal solve. ``target_resid`` defaults to the f32 waveform
    noise floor (~1e-3 relative) — the best any basis can do when the
    runtime evaluates waveforms in f32.
    """
    _, s, vh = np.linalg.svd(train, full_matrices=False)
    n_max = int(np.sum(s >= max(tol, 1e-12) * s[0]))
    n_max = min(max(n_max, 2), len(s), len(train) // 2, n_cap)

    hold_norm = np.linalg.norm(holdout, axis=1)
    best = None
    n = 2
    while n <= n_max:
        nodes, a_mat = _empirical_interpolation(vh[:n])
        if np.linalg.cond(a_mat) <= max_cond:
            coeff = np.linalg.solve(a_mat, holdout[:, nodes].T)  # [n, H]
            resid = holdout - coeff.T @ vh[:n]
            worst = float(np.max(np.linalg.norm(resid, axis=1)
                                 / np.maximum(hold_norm, 1e-300)))
            if best is None or worst < best[0]:
                best = (worst, n, nodes, a_mat)
            if worst < target_resid:
                break
        n = n + max(n // 4, 1)
    if best is None:
        nodes, a_mat = _empirical_interpolation(vh[:2])
        return vh[:2], nodes, a_mat
    _, n, nodes, a_mat = best
    return vh[:n], nodes, a_mat


class ROQGWLikelihood:
    """Multi-detector ROQ likelihood: waveforms evaluated only at the
    EIM nodes, inner products from precomputed weights.

    ``basis``: one :class:`ROQBasis` shared by every ifo (only valid if
    it was built detector-projected for that single ifo), or a
    {ifo_name: ROQBasis} dict from :func:`build_roq_bases`."""

    def __init__(self, interferometers, basis,
                 waveform=taylorf2_tidal, trigger_time=0.0,
                 phase_marginalization=False):
        self.ifos = list(interferometers)
        self.basis = basis
        self.waveform = waveform
        self.trigger_time = float(trigger_time)
        self.phase_marginalization = bool(phase_marginalization)

        # strain-amplitude rescaling: raw quadratic weights are ~1e43
        # (1/PSD) and overflow f32; weights carry amp_scale powers and
        # templates are divided by amp_scale at evaluation
        d0 = np.abs(np.asarray(self.ifos[0].strain))
        vals = d0[d0 > 0]
        self._amp_scale = float(np.median(vals)) if vals.size else 1e-22

        self._lin_w = []    # [m] complex weights per ifo (scaled)
        self._quad_w = []   # [q] real weights per ifo (scaled)
        self._bases = []
        for ifo in self.ifos:
            b = basis[ifo.name] if isinstance(basis, dict) else basis
            self._bases.append(b)
            if len(ifo.frequencies) != len(b.frequencies) or not \
                    np.allclose(ifo.frequencies, b.frequencies):
                raise ValueError(f"{ifo.name}: frequency grid does not "
                                 "match the ROQ basis")
            df = 1.0 / ifo.duration
            psd = np.asarray(ifo.psd, dtype=np.float64)
            good = np.isfinite(psd) & (psd > 0)
            inv_s = np.where(good, 1.0 / psd, 0.0)
            d = np.asarray(ifo.strain, dtype=np.complex128)

            # b_j = 4 df sum_f conj(d) B_j / S ;  w = A^{-1 T} b
            b_lin = 4.0 * df * (b.lin_basis * (np.conj(d) * inv_s)
                                [None, :]).sum(axis=1)
            w_lin = np.linalg.solve(b.lin_a.T, b_lin) * self._amp_scale
            b_quad = 4.0 * df * (b.quad_basis * inv_s[None, :]).sum(
                axis=1)
            w_quad = np.linalg.solve(b.quad_a.T, b_quad) * \
                self._amp_scale ** 2
            self._lin_w.append((jnp.asarray(w_lin.real),
                                jnp.asarray(w_lin.imag)))
            self._quad_w.append(jnp.asarray(w_quad.real))

        self._f_lin = [jnp.asarray(b.frequencies[b.lin_nodes])
                       for b in self._bases]
        self._f_quad = [jnp.asarray(b.frequencies[b.quad_nodes])
                        for b in self._bases]

    def log_likelihood_ratio(self, parameters):
        d_inner_h = jnp.asarray(0.0 + 0.0j)
        h_inner_h = jnp.asarray(0.0)
        inv_amp = 1.0 / self._amp_scale
        for i, ifo in enumerate(self.ifos):
            h_lin = project_signal(ifo.detector, self.waveform,
                                   self._f_lin[i], parameters,
                                   self.trigger_time) * inv_amp  # [m]
            h_quad = project_signal(ifo.detector, self.waveform,
                                    self._f_quad[i], parameters,
                                    self.trigger_time) * inv_amp  # [q]
            w_re, w_im = self._lin_w[i]
            # <d|h> ~= sum_k w_k h(F_k), w = A^{-T} b (EIM coefficients)
            d_inner_h = d_inner_h + jnp.sum((w_re + 1j * w_im) * h_lin)
            h_inner_h = h_inner_h + jnp.sum(
                self._quad_w[i] * (jnp.conj(h_quad) * h_quad).real)
        if self.phase_marginalization:
            from .likelihood import _log_i0
            return _log_i0(jnp.abs(d_inner_h)) - 0.5 * h_inner_h
        return d_inner_h.real - 0.5 * h_inner_h

    def log_likelihood(self, parameters):
        return self.log_likelihood_ratio(parameters)

    def __call__(self, parameters):
        return self.log_likelihood_ratio(parameters)
