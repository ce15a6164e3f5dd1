"""SVD-surrogate training: grid ingestion -> SVD -> batched-MLP fit.

TPU-native counterpart of ``nmma/em/training.py`` (``BaseTrainingModel`` /
``KerasTrainingModel`` / ``create_svdmodel``): the reference trains one
keras MLP per filter sequentially; here every filter's network lives in a
stacked ``[F, ...]`` parameter tensor and a single optax/adam loop trains
all of them at once (the batched forward is three einsums — the same
kernel the inference path uses).

Pipeline (matching reference semantics, nmma/em/training.py:164-265):
  1. read a training grid (bulla/standard formats), extracting parameters
     from filenames (em/model_parameters.py conventions);
  2. interpolate every light curve onto the surrogate time grid;
  3. min-max normalize per filter per time bin; SVD; project to
     ``n_coeff`` coefficients;
  4. fit MLP (Dense(H, relu) -> Dense(C)) to (normalized params ->
     coefficients) with adam/MSE and a held-out split.
"""

from __future__ import annotations

import functools
import os
import re
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.svd import SVDModelData
from ..ops.interp import masked_interp_linear

_NUM_RE = r"[-+]?[.]?[\d]+(?:,\d\d\d)*[\.]?\d*(?:[eE][-+]?\d+)?"

# filename -> parameter extraction, per grid family
# (reference: nmma/em/model_parameters.py:98-149)
GRID_PARSERS = {}


def _register(name, parameters, indices, log_indices=()):
    def parse(filename):
        stem = os.path.basename(filename)
        for ext in (".csv", ".txt", ".dat", ".hdf5", ".h5"):
            stem = stem.replace(ext, "")
        vals = [float(x) for x in re.findall(_NUM_RE, stem)]
        out = {}
        for param, idx in zip(parameters, indices):
            v = vals[idx]
            if idx in log_indices:
                v = np.log10(v)
            out[param] = v
        return out
    GRID_PARSERS[name] = (parse, list(parameters))
    return parse


_register("Bu2019lm", ["log10_mej_dyn", "log10_mej_wind", "KNphi", "KNtheta"],
          [1, 2, 3, 4], log_indices=(1, 2))
_register("Bu2019lm_sparse", ["log10_mej_dyn", "log10_mej_wind"],
          [1, 2], log_indices=(1, 2))
_register("Bu2019nsbh", ["log10_mej_dyn", "log10_mej_wind", "KNtheta"],
          [1, 2, 3], log_indices=(1, 2))
_register("Bu2022Ye", ["log10_mej_dyn", "vej_dyn", "Yedyn", "log10_mej_wind",
                       "vej_wind", "KNtheta"],
          [1, 2, 3, 4, 5, 6], log_indices=(1, 4))
_register("Ka2017", ["log10_mej", "log10_vej", "log10_Xlan"],
          [0, 1, 2], log_indices=(0, 1, 2))
# AnBa2022 family (reference model_parameters.py:8-96; 'm56' -> mni handled
# by the numeric extraction; masses interpolated in log10 for the _log set)
_register("AnBa2022_linear", ["mtot", "mni", "vej", "mrp", "xmix"],
          [0, 2, 1, 3, 4])
_register("AnBa2022_log", ["log10_mtot", "log10_mni", "vej", "log10_mrp",
                           "xmix"], [0, 2, 1, 3, 4], log_indices=(0, 2, 3))
_register("AnBa2022_sparse", ["mrp", "xmix"], [3, 4])


def _parse_bu2023ye(filename):
    """Bu2023Ye grid parser (reference model_parameters.py:213-246):
    seven leading numbers, |.| applied, masses in log10."""
    stem = os.path.basename(filename)
    for ext in (".csv", ".txt", ".dat", ".hdf5", ".h5"):
        stem = stem.replace(ext, "")
    vals = [abs(float(x)) for x in re.findall(_NUM_RE, stem)]
    names = ["log10_mej_dyn", "vej_dyn", "Yedyn", "log10_mej_wind",
             "vej_wind", "Yewind", "KNtheta"]
    out = dict(zip(names, vals))
    out["log10_mej_dyn"] = np.log10(out["log10_mej_dyn"])
    out["log10_mej_wind"] = np.log10(out["log10_mej_wind"])
    return out


GRID_PARSERS["Bu2023Ye"] = (
    _parse_bu2023ye,
    ["log10_mej_dyn", "vej_dyn", "Yedyn", "log10_mej_wind", "vej_wind",
     "Yewind", "KNtheta"])


def _parse_cv(filename):
    """Toy 'CV' example grid (reference model_parameters.py:84-96): one
    parameter per file. The reference assigns the enumeration index; here
    the first number in the filename is used (falling back to 0.0), which
    is stable under any file ordering."""
    stem = os.path.basename(filename)
    for ext in (".csv", ".txt", ".dat", ".hdf5", ".h5"):
        stem = stem.replace(ext, "")
    vals = re.findall(_NUM_RE, stem)
    return {"example_num": float(vals[0]) if vals else 0.0}


GRID_PARSERS["CV"] = (_parse_cv, ["example_num"])


def _parse_lanl(filename):
    """LANL grid filename parser (reference get_knprops_from_LANLfilename,
    nmma/em/utils.py:1039-1140): two-component morphology files like
    'Run_TP_dyn_all_lanth_wind2_all_md0.1_vd0.3_mw0.001_vw0.05_mags_*.dat'.
    """
    stem = os.path.basename(filename)
    out = {}
    for info in stem.split("_"):
        if info.startswith("md"):
            v = float(info[2:])
            if "." not in info:
                v /= 100 if "1" in info else 1000
            out["log10_mej_dyn"] = np.log10(v)
        elif info.startswith("vd"):
            v = float(info[2:])
            if "." not in info:
                v /= 100 if "5" in info else 10
            out["vej_dyn"] = v
        elif info.startswith("mw"):
            v = float(info[2:])
            if "." not in info:
                v /= 100 if "1" in info else 1000
            out["log10_mej_wind"] = np.log10(v)
        elif info.startswith("vw"):
            v = float(info[2:])
            if "." not in info:
                v /= 100 if "5" in info else 10
            out["vej_wind"] = v
        elif info.startswith("theta") or info.startswith("angle"):
            try:
                out["KNtheta"] = float(info.lstrip("thetaangle"))
            except ValueError:
                pass
    out.setdefault("KNtheta", 0.0)
    return out


for _lanl_name in ("LANL2022", "LANLTP1", "LANLTP2", "LANLTS1", "LANLTS2"):
    GRID_PARSERS[_lanl_name] = (
        _parse_lanl,
        ["log10_mej_dyn", "vej_dyn", "log10_mej_wind", "vej_wind", "KNtheta"])


def read_bulla_grid(files, model="Bu2019lm_sparse", filters=None):
    """Read bulla-format grid files: header '# t[days] f1 f2 ...'.

    Returns (params [N, P], times list, mags [N, F, T_i]-like dict form).
    (reference read_photometry_files 'bulla' branch, nmma/em/io.py:352-377)
    """
    from ..native import parse_many
    parse, parameter_names = GRID_PARSERS[model]
    files = sorted(files)
    if not files:
        raise FileNotFoundError(
            f"no grid files to read for model {model!r} — the data path "
            f"matched nothing")
    tables = parse_many(files)     # native mmap+thread loader (w/ fallback)
    entries = []
    for fn, arr in zip(files, tables):
        with open(fn) as f:
            header = f.readline().strip().lstrip("#").split()
        cols = header[1:]                  # first col is t[days]
        t = arr[:, 0]
        mags = {c: arr[:, i + 1] for i, c in enumerate(cols)}
        entries.append({"params": parse(fn), "t": t, "mags": mags})
    if filters is None:
        filters = list(entries[0]["mags"].keys())
    return entries, parameter_names, list(filters)


def axial_symmetry(entries):
    """Augment a grid with the KNtheta -> -theta and 180-theta copies.

    Counterpart of the reference's ``axial_symmetry``
    (nmma/em/training.py:764-779): light curves are invariant under the
    axial reflection of the observation angle, so every grid entry is
    duplicated at the two mirrored angles with identical photometry.
    """
    if any("KNtheta" not in e["params"] for e in entries):
        raise ValueError("unknown symmetry parameter")
    out = list(entries)
    for e in entries:
        for theta in (-e["params"]["KNtheta"],
                      180.0 - e["params"]["KNtheta"]):
            p = dict(e["params"])
            p["KNtheta"] = theta
            out.append({**e, "params": p})
    return out


@dataclass
class SVDTrainingConfig:
    n_coeff: int = 10
    hidden: int = 128
    n_epochs: int = 2000
    learning_rate: float = 1e-3
    holdout_fraction: float = 0.1
    tmin: float = 0.1
    tmax: float = 14.0
    n_tsteps: int = 100
    seed: int = 42
    # reference --use-UnivariateSpline / --UnivariateSpline-s
    # (em/training.py:127-131, autocomplete_data 'spline' mode): smooth
    # each grid light curve with a smoothing spline before sampling it
    # onto the surrogate grid (host-side preprocessing, not a hot path)
    univariate_spline: bool = False
    univariate_spline_s: float = 2.0


def _interp_grid(entries, filters, tt, spline=False, spline_s=2.0):
    """[N, F, T] magnitudes on the surrogate grid (linear extrapolation,
    or smoothing-spline resampling with ``spline=True``)."""
    n, f_n, t_n = len(entries), len(filters), len(tt)
    out = np.zeros((n, f_n, t_n))
    for i, e in enumerate(entries):
        for j, filt in enumerate(filters):
            if spline:
                from scipy.interpolate import UnivariateSpline
                t_i = np.asarray(e["t"], dtype=float)
                y_i = np.asarray(e["mags"][filt], dtype=float)
                good = np.isfinite(t_i) & np.isfinite(y_i)
                if good.sum() >= 4:
                    sp = UnivariateSpline(t_i[good], y_i[good], s=spline_s)
                    row = sp(np.asarray(tt))
                    row[(tt < t_i[good].min()) | (tt > t_i[good].max())] \
                        = np.nan
                    out[i, j] = row
                    continue
            out[i, j] = np.asarray(masked_interp_linear(
                tt, e["t"], e["mags"][filt], fill_value=np.nan))
    return out


def _interp_spectra(entries, tt):
    """[N, L, T] log10 fluxes on the surrogate grid.

    Spectroscopy branch of the reference's interpolate_data
    (nmma/em/training.py:186-192): interpolate log10(f_nu) over time per
    wavelength bin; wavelength bins then play the role of filters.
    """
    n = len(entries)
    lam = np.asarray(entries[0]["lambdas"])
    t_n = len(tt)
    out = np.zeros((n, len(lam), t_n))
    for i, e in enumerate(entries):
        fnu = np.asarray(e["fnu"])          # [T_i, L]
        with np.errstate(divide="ignore"):
            log_f = np.log10(np.maximum(fnu, 1e-300))
        for j in range(len(lam)):
            out[i, j] = np.asarray(masked_interp_linear(
                tt, e["t"], log_f[:, j], fill_value=np.nan))
    return out, lam


def normalize_params(params, p_mins, p_maxs):
    """Min-max parameter normalisation with a zero-span guard: a
    parameter constant across the whole grid (e.g. the LANL parsers'
    KNtheta=0 default) must map to 0, not 0/0 = NaN."""
    span = np.where(p_maxs > p_mins, p_maxs - p_mins, 1.0)
    return (params - p_mins) / span


def _normalize_and_decompose(data, params, n_coeff):
    """Shared min-max + per-filter-SVD block for the MLP and GP trainers.

    NaN-safe: interpolated grids carry NaN where an entry has no
    coverage (spline mode out-of-span, <2 finite samples), so the
    normalisation bounds use nanmin/nanmax — a plain min would poison
    the SAVED mins/maxs and every inference magnitude with NaN.
    Returns (p_mins, p_maxs, x, mins, maxs, va [F,T,C], coeffs [N,F,C]).
    """
    p_mins, p_maxs = params.min(0), params.max(0)
    x = normalize_params(params, p_mins, p_maxs)

    with np.errstate(all="ignore"):
        mins = np.nan_to_num(np.nanmin(data, axis=0), nan=0.0)  # [F, T]
        maxs = np.nan_to_num(np.nanmax(data, axis=0), nan=0.0)
    span = np.where(maxs > mins, maxs - mins, 1.0)
    norm = np.nan_to_num((data - mins) / span, nan=0.0)

    n_c = min(n_coeff, data.shape[0], data.shape[2])
    va_list, coeff_list = [], []
    for j in range(data.shape[1]):
        _, _, vt = np.linalg.svd(norm[:, j, :], full_matrices=True)
        va_j = vt.T[:, :n_c]                            # [T, C]
        va_list.append(va_j)
        coeff_list.append(norm[:, j, :] @ va_j)         # [N, C]
    va = np.stack(va_list)                              # [F, T, C]
    coeffs = np.stack(coeff_list, axis=1)               # [N, F, C]
    return p_mins, p_maxs, x, mins, maxs, va, coeffs


def train_svd_model(entries, parameter_names, filters=None,
                    config: SVDTrainingConfig = SVDTrainingConfig(),
                    verbose=True, data_type="photometry",
                    init_model: "SVDModelData" = None) -> SVDModelData:
    """Train the stacked-MLP SVD surrogate.

    ``init_model`` continues training from a previously saved surrogate
    (reference ``continue_training``, em/training.py:142-159): the saved
    basis, normalisations, and MLP weights are reused, and the new grid
    is projected onto the SAVED basis so optimization resumes where the
    earlier run stopped.
    """
    cfg = config
    if init_model is not None:
        tt = np.asarray(init_model.tt)
    else:
        tt = np.linspace(cfg.tmin, cfg.tmax, cfg.n_tsteps)
    if data_type == "spectroscopy":
        data, lam = _interp_spectra(entries, tt)        # [N, L, T] log10 f
        filters = [f"lambda_{l:.0f}" for l in lam]
    else:
        data = _interp_grid(entries, filters, tt,
                            spline=cfg.univariate_spline,
                            spline_s=cfg.univariate_spline_s)  # [N, F, T]
    params = np.asarray([[e["params"][p] for p in parameter_names]
                         for e in entries])             # [N, P]

    if init_model is not None:
        if tuple(init_model.filters) != tuple(filters):
            raise ValueError(
                f"continue-training filter mismatch: saved "
                f"{init_model.filters} vs requested {tuple(filters)}")
        p_mins = np.asarray(init_model.param_mins)
        p_maxs = np.asarray(init_model.param_maxs)
        mins = np.asarray(init_model.mins)
        maxs = np.asarray(init_model.maxs)
        va = np.asarray(init_model.va)                  # [F, T, C]
        n_c = va.shape[2]
        x = normalize_params(params, p_mins, p_maxs)
        span = np.where(maxs > mins, maxs - mins, 1.0)
        norm = np.nan_to_num((data - mins) / span, nan=0.0)
        coeffs = np.einsum("nft,ftc->nfc", norm, va)    # saved basis
    else:
        (p_mins, p_maxs, x, mins, maxs, va,
         coeffs) = _normalize_and_decompose(data, params, cfg.n_coeff)
        n_c = va.shape[2]

    # ---- batched MLP training over the filter axis ----
    key = jax.random.PRNGKey(cfg.seed)
    f_n, p_n, h_n = len(filters), params.shape[1], cfg.hidden
    k1, k2, k3 = jax.random.split(key, 3)
    if init_model is not None:
        net = {"w1": jnp.asarray(init_model.w1),
               "b1": jnp.asarray(init_model.b1),
               "w2": jnp.asarray(init_model.w2),
               "b2": jnp.asarray(init_model.b2)}
    else:
        w1 = jax.random.normal(k1, (f_n, p_n, h_n)) * np.sqrt(2.0 / p_n)
        w2 = jax.random.normal(k2, (f_n, h_n, n_c)) * np.sqrt(1.0 / h_n)
        net = {"w1": w1, "b1": jnp.zeros((f_n, h_n)),
               "w2": w2, "b2": jnp.zeros((f_n, n_c))}

    n = len(entries)
    # holdout_fraction=0.0 means train on the FULL grid (no silent
    # one-point withholding); a nonzero fraction keeps at least one
    n_hold = 0
    if cfg.holdout_fraction > 0 and n > 4:
        n_hold = max(1, int(round(n * cfg.holdout_fraction)))
    perm = np.random.default_rng(cfg.seed).permutation(n)
    train_idx, hold_idx = perm[n_hold:], perm[:n_hold]

    x_train = jnp.asarray(x[train_idx])
    y_train = jnp.asarray(coeffs[train_idx])

    def forward(net, xb):
        h = jax.nn.relu(jnp.einsum("np,fph->nfh", xb, net["w1"]) + net["b1"])
        return jnp.einsum("nfh,fhc->nfc", h, net["w2"]) + net["b2"]

    def loss_fn(net, xb, yb):
        return jnp.mean((forward(net, xb) - yb) ** 2)

    opt = optax.adam(cfg.learning_rate)
    opt_state = opt.init(net)

    def step(carry, _):
        net, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(net, x_train, y_train)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(net, updates), opt_state), loss

    # fuse a block of epochs into one scanned program: per-epoch python
    # dispatch is one remote round trip each on the axon backend. The
    # final block runs the exact remainder (at most one extra compile)
    # so the trained epoch count matches n_epochs exactly.
    n_blocks = 5 if verbose else 1
    block = max(1, cfg.n_epochs // n_blocks)

    @functools.partial(jax.jit, static_argnames=("length",))
    def run_block(net, opt_state, length):
        (net, opt_state), losses = jax.lax.scan(
            step, (net, opt_state), None, length=length)
        return net, opt_state, losses[-1]

    done = 0
    while done < cfg.n_epochs:
        k = min(block, cfg.n_epochs - done)
        net, opt_state, loss = run_block(net, opt_state, k)
        done += k
        if verbose:
            print(f"epoch {done:5d} train mse {float(loss):.5f}")
    if n_hold:
        hold_loss = float(jax.jit(loss_fn)(
            net, jnp.asarray(x[hold_idx]), jnp.asarray(coeffs[hold_idx])))
        if verbose:
            print(f"holdout mse {hold_loss:.5f} ({n_hold} grid points)")

    return SVDModelData(
        filters=tuple(filters), parameter_names=tuple(parameter_names),
        tt=tt, va=va, mins=mins, maxs=maxs,
        param_mins=p_mins, param_maxs=p_maxs,
        w1=np.asarray(net["w1"]), b1=np.asarray(net["b1"]),
        w2=np.asarray(net["w2"]), b2=np.asarray(net["b2"]))


def benchmark_svd_model(svd: SVDModelData, entries, parameter_names,
                        filters=None):
    """Reduced-chi^2 percentiles of the surrogate vs its training grid.

    Counterpart of ``create_benchmark`` (nmma/em/training.py:611-739):
    for every grid point, chi^2/dof between the surrogate prediction and
    the gridded light curve (1 mag error scale), reported as
    {filter: percentiles [0, 25, 50, 75, 100]}.
    """
    from ..models.svd import svd_surrogate_mags
    filters = filters or list(svd.filters)
    tt = svd.tt
    chi2 = {f: [] for f in filters}
    for e in entries:
        params = {p: e["params"][p] for p in parameter_names}
        pred = np.asarray(svd_surrogate_mags(svd, params, jnp.asarray(tt)))
        for f in filters:
            j = list(svd.filters).index(f)   # pred rows follow svd.filters
            truth = np.asarray(masked_interp_linear(tt, e["t"], e["mags"][f],
                                                    fill_value=np.nan))
            sel = np.isfinite(truth) & np.isfinite(pred[j])
            if sel.sum() < 2:
                continue
            chi2[f].append(np.sum((pred[j][sel] - truth[sel]) ** 2)
                           / max(sel.sum() - 1, 1))
    return {f: np.percentile(v, [0, 25, 50, 75, 100]).tolist()
            for f, v in chi2.items() if v}
