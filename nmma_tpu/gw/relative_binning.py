"""Relative-binning (heterodyned) GW likelihood.

Counterpart of the reference's ``RelativeBinningGravitationalWaveTransient``
option (``nmma/gw/gw_likelihood.py:164-207``, via bilby), implemented from
the published algorithm (Zackay, Dai & Venumadhav 2018; Cornish 2010):

* the waveform ratio r(f) = h(f)/h0(f) against a fiducial h0 is smooth, so
  the full-band inner products collapse onto sparse frequency bins with
  per-bin linearization r(f) ~ r0 + r1 (f - f_mid);
* the summary data A0, A1, B0, B1 are precomputed once host-side in
  float64; the per-sample cost is one waveform evaluation at the ~O(100)
  bin edges plus O(bins) arithmetic — a ~300x reduction over the dense
  Whittle sum, ideal for batched TPU sampling.

Bin edges follow the standard power-law phase-difference criterion with
PN exponents gamma = (-5/3, -2/3, 1, 5/3, 7/3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .likelihood import project_signal
from .waveforms import taylorf2_tidal

_GAMMA = np.array([-5.0 / 3.0, -2.0 / 3.0, 1.0, 5.0 / 3.0, 7.0 / 3.0])


def setup_bins(f_min, f_max, chi=1.0, eps=0.5):
    """Frequency bin edges with bounded heterodyne phase error.

    delta_psi(f) = chi * 2pi * sum_i sign(g_i) (f/f*)^{g_i}; bins are the
    level sets spaced by eps (Zackay+ 2018 eq. 10-12).
    """
    f = np.linspace(f_min, f_max, 10000)
    f_star = np.where(_GAMMA >= 0, f_max, f_min)
    d_psi = chi * 2.0 * np.pi * np.sum(
        np.sign(_GAMMA)[None, :] * (f[:, None] / f_star[None, :])
        ** _GAMMA[None, :], axis=1)
    d_psi = d_psi - d_psi[0]
    n_bins = max(int(np.ceil(d_psi[-1] / eps)), 8)
    targets = np.linspace(0.0, d_psi[-1], n_bins + 1)
    edges = np.interp(targets, d_psi, f)
    edges[0], edges[-1] = f_min, f_max
    return np.unique(edges)


class RelativeBinningGWLikelihood:
    """Heterodyned multi-detector likelihood around a fiducial waveform."""

    def __init__(self, interferometers, fiducial_parameters,
                 waveform=taylorf2_tidal, trigger_time=0.0, chi=1.0,
                 eps=0.5, phase_marginalization=False):
        self.ifos = list(interferometers)
        self.waveform = waveform
        self.trigger_time = float(trigger_time)
        self.phase_marginalization = bool(phase_marginalization)
        self.fiducial_parameters = dict(fiducial_parameters)

        self._summary = []
        for ifo in self.ifos:
            freqs = np.asarray(ifo.frequencies, dtype=np.float64)
            psd = np.asarray(ifo.psd, dtype=np.float64)
            good = np.isfinite(psd) & (psd > 0)
            df = 1.0 / ifo.duration

            from .likelihood import _to_host_complex
            _projected = jax.jit(
                lambda f, det=ifo.detector: project_signal(
                    det, waveform, f, fiducial_parameters, trigger_time))
            h0 = _to_host_complex(_projected(freqs))
            data = np.asarray(ifo.strain, dtype=np.complex128)

            edges = setup_bins(freqs[good].min(), freqs[good].max(), chi, eps)
            # assign each frequency sample to a bin
            bin_idx = np.clip(np.searchsorted(edges, freqs, side="right") - 1,
                              0, len(edges) - 2)
            f_mid = 0.5 * (edges[1:] + edges[:-1])

            w = np.where(good & (np.abs(h0) > 0), 4.0 * df / psd, 0.0)
            dh0 = data * np.conj(h0) * w
            hh0 = (np.abs(h0) ** 2) * w
            d_f = freqs - f_mid[bin_idx]

            n_b = len(edges) - 1
            a0 = np.zeros(n_b, dtype=np.complex128)
            a1 = np.zeros(n_b, dtype=np.complex128)
            b0 = np.zeros(n_b)
            b1 = np.zeros(n_b)
            np.add.at(a0, bin_idx, dh0)
            np.add.at(a1, bin_idx, dh0 * d_f)
            np.add.at(b0, bin_idx, hh0)
            np.add.at(b1, bin_idx, hh0 * d_f)

            # fiducial waveform at the bin edges for the runtime ratio
            h0_edges = _to_host_complex(_projected(jnp.asarray(edges)))
            safe = np.where(np.abs(h0_edges) > 0, h0_edges, 1.0)
            inv_h0 = 1.0 / safe
            # complex host->device transfers are UNIMPLEMENTED on the axon
            # backend: ship real/imag parts and recombine inside the jit
            self._summary.append(dict(
                edges=jnp.asarray(edges),
                a0_re=jnp.asarray(a0.real), a0_im=jnp.asarray(a0.imag),
                a1_re=jnp.asarray(a1.real), a1_im=jnp.asarray(a1.imag),
                b0=jnp.asarray(b0), b1=jnp.asarray(b1),
                inv_h0_re=jnp.asarray(inv_h0.real),
                inv_h0_im=jnp.asarray(inv_h0.imag),
                h0_ok=jnp.asarray(np.abs(h0_edges) > 0),
            ))

    def log_likelihood_ratio(self, parameters):
        d_inner_h = jnp.asarray(0.0 + 0.0j)
        h_inner_h = jnp.asarray(0.0)
        for ifo, s in zip(self.ifos, self._summary):
            h_edges = project_signal(ifo.detector, self.waveform, s["edges"],
                                     parameters, self.trigger_time)
            inv_h0 = s["inv_h0_re"] + 1j * s["inv_h0_im"]
            r_edges = jnp.where(s["h0_ok"], h_edges * inv_h0, 0.0)
            r0 = 0.5 * (r_edges[1:] + r_edges[:-1])
            dr = (r_edges[1:] - r_edges[:-1]) / jnp.diff(s["edges"])

            a0 = s["a0_re"] + 1j * s["a0_im"]
            a1 = s["a1_re"] + 1j * s["a1_im"]
            d_inner_h = d_inner_h + jnp.sum(a0 * jnp.conj(r0)
                                            + a1 * jnp.conj(dr))
            h_inner_h = h_inner_h + jnp.sum(
                s["b0"] * jnp.abs(r0) ** 2
                + 2.0 * s["b1"] * (r0 * jnp.conj(dr)).real)
        if self.phase_marginalization:
            from .likelihood import _log_i0
            return _log_i0(jnp.abs(d_inner_h)) - 0.5 * h_inner_h
        return d_inner_h.real - 0.5 * h_inner_h

    def log_likelihood(self, parameters):
        return self.log_likelihood_ratio(parameters)

    def __call__(self, parameters):
        return self.log_likelihood_ratio(parameters)
