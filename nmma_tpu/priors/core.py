"""Prior system: analytic unit-cube transforms, jit/vmap-native.

TPU-native counterpart of the bilby prior layer the reference leans on
(``bilby.core.prior`` + ``nmma/em/prior.py``). Nested sampling operates in
the unit hypercube (the reference's ``prior_transform``,
``nmma/core/mpi_setup.py:682-683``); here every prior is an explicit,
closed-form inverse-CDF transform ``u in [0,1] -> x`` built from jnp ops, so
a whole live-point batch maps through ``PriorDict.transform`` inside one jit.

Conditional priors receive the already-transformed parameter dict; priors
are evaluated in declaration order (parents first), mirroring bilby's
conditional-resolution convention.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtri
from jax.scipy.stats import norm as jnorm


class Prior:
    """Base prior: named 1-D distribution with a unit-cube transform."""

    sampled = True       # participates in the unit-cube vector
    conditional = False  # transform consumes previously transformed params

    def __init__(self, name=None, latex_label=None, minimum=-np.inf,
                 maximum=np.inf, unit=None, boundary=None):
        self.name = name
        self.latex_label = latex_label
        self.minimum = float(minimum)
        self.maximum = float(maximum)
        self.unit = unit
        self.boundary = boundary

    def transform(self, u, params=None):
        raise NotImplementedError

    def log_prob(self, x):
        raise NotImplementedError

    def __repr__(self):
        return (f"{type(self).__name__}(name={self.name!r}, "
                f"minimum={self.minimum}, maximum={self.maximum})")


class Uniform(Prior):
    def transform(self, u, params=None):
        return self.minimum + u * (self.maximum - self.minimum)

    def log_prob(self, x):
        in_range = (x >= self.minimum) & (x <= self.maximum)
        return jnp.where(in_range, -math.log(self.maximum - self.minimum),
                         -jnp.inf)


class DeltaFunction(Prior):
    sampled = False

    def __init__(self, peak=None, value=None, name=None, latex_label=None,
                 **kwargs):
        peak = peak if peak is not None else value
        super().__init__(name=name, latex_label=latex_label, minimum=peak,
                         maximum=peak)
        self.peak = float(peak)

    def transform(self, u=None, params=None):
        return jnp.asarray(self.peak)

    def log_prob(self, x):
        return jnp.where(x == self.peak, 0.0, -jnp.inf)


class LogUniform(Prior):
    def transform(self, u, params=None):
        lo, hi = math.log(self.minimum), math.log(self.maximum)
        return jnp.exp(lo + u * (hi - lo))

    def log_prob(self, x):
        norm_c = math.log(self.maximum) - math.log(self.minimum)
        in_range = (x >= self.minimum) & (x <= self.maximum)
        return jnp.where(in_range, -jnp.log(x) - math.log(norm_c), -jnp.inf)


class PowerLaw(Prior):
    def __init__(self, alpha, minimum, maximum, name=None, latex_label=None,
                 **kwargs):
        super().__init__(name=name, latex_label=latex_label, minimum=minimum,
                         maximum=maximum)
        self.alpha = float(alpha)

    def transform(self, u, params=None):
        if self.alpha == -1.0:
            lo, hi = math.log(self.minimum), math.log(self.maximum)
            return jnp.exp(lo + u * (hi - lo))
        ap1 = self.alpha + 1.0
        lo, hi = self.minimum**ap1, self.maximum**ap1
        return jnp.power(lo + u * (hi - lo), 1.0 / ap1)

    def log_prob(self, x):
        if self.alpha == -1.0:
            norm_c = math.log(self.maximum / self.minimum)
            lp = -jnp.log(x) - math.log(norm_c)
        else:
            ap1 = self.alpha + 1.0
            norm_c = (self.maximum**ap1 - self.minimum**ap1) / ap1
            lp = self.alpha * jnp.log(x) - math.log(norm_c)
        in_range = (x >= self.minimum) & (x <= self.maximum)
        return jnp.where(in_range, lp, -jnp.inf)


class Sine(Prior):
    """p(x) ~ sin(x) on [minimum, maximum] (default [0, pi])."""

    def __init__(self, name=None, latex_label=None, minimum=0.0,
                 maximum=np.pi, **kwargs):
        super().__init__(name=name, latex_label=latex_label, minimum=minimum,
                         maximum=maximum)

    def transform(self, u, params=None):
        c_lo, c_hi = math.cos(self.minimum), math.cos(self.maximum)
        return jnp.arccos(c_lo + u * (c_hi - c_lo))

    def log_prob(self, x):
        norm_c = math.cos(self.minimum) - math.cos(self.maximum)
        in_range = (x >= self.minimum) & (x <= self.maximum)
        return jnp.where(in_range, jnp.log(jnp.sin(x)) - math.log(norm_c),
                         -jnp.inf)


class Cosine(Prior):
    """p(x) ~ cos(x) on [minimum, maximum] (default [-pi/2, pi/2])."""

    def __init__(self, name=None, latex_label=None, minimum=-np.pi / 2,
                 maximum=np.pi / 2, **kwargs):
        super().__init__(name=name, latex_label=latex_label, minimum=minimum,
                         maximum=maximum)

    def transform(self, u, params=None):
        s_lo, s_hi = math.sin(self.minimum), math.sin(self.maximum)
        return jnp.arcsin(s_lo + u * (s_hi - s_lo))

    def log_prob(self, x):
        norm_c = math.sin(self.maximum) - math.sin(self.minimum)
        in_range = (x >= self.minimum) & (x <= self.maximum)
        return jnp.where(in_range, jnp.log(jnp.cos(x)) - math.log(norm_c),
                         -jnp.inf)


class Gaussian(Prior):
    def __init__(self, mu, sigma, name=None, latex_label=None, **kwargs):
        super().__init__(name=name, latex_label=latex_label)
        self.mu, self.sigma = float(mu), float(sigma)

    def transform(self, u, params=None):
        return self.mu + self.sigma * ndtri(u)

    def log_prob(self, x):
        return jnorm.logpdf(x, self.mu, self.sigma)


class TruncatedGaussian(Prior):
    def __init__(self, mu, sigma, minimum, maximum, name=None,
                 latex_label=None, **kwargs):
        super().__init__(name=name, latex_label=latex_label, minimum=minimum,
                         maximum=maximum)
        self.mu, self.sigma = float(mu), float(sigma)

    def _cdf_bounds(self):
        from scipy.special import ndtr
        a = (self.minimum - self.mu) / self.sigma
        b = (self.maximum - self.mu) / self.sigma
        return float(ndtr(a)), float(ndtr(b))

    def transform(self, u, params=None):
        phi_a, phi_b = self._cdf_bounds()
        return self.mu + self.sigma * ndtri(phi_a + u * (phi_b - phi_a))

    def log_prob(self, x):
        phi_a, phi_b = self._cdf_bounds()
        in_range = (x >= self.minimum) & (x <= self.maximum)
        return jnp.where(
            in_range,
            jnorm.logpdf(x, self.mu, self.sigma) - math.log(phi_b - phi_a),
            -jnp.inf,
        )


# bilby aliases
TruncatedNormal = TruncatedGaussian
Normal = Gaussian


class LogNormal(Prior):
    def __init__(self, mu, sigma, name=None, latex_label=None, **kwargs):
        super().__init__(name=name, latex_label=latex_label, minimum=0.0)
        self.mu, self.sigma = float(mu), float(sigma)

    def transform(self, u, params=None):
        return jnp.exp(self.mu + self.sigma * ndtri(u))

    def log_prob(self, x):
        x = jnp.asarray(x)
        lx = jnp.log(jnp.maximum(x, 1e-300))
        return jnp.where(x > 0.0,
                         jnorm.logpdf(lx, self.mu, self.sigma) - lx,
                         -jnp.inf)


class Interped(Prior):
    """Tabulated density: CDF precomputed host-side, inverted on device.

    Counterpart of bilby's Interped (used for the Hubble prior,
    nmma/em/prior.py:172-218).
    """

    def __init__(self, xx, yy, minimum=None, maximum=None, name=None,
                 latex_label=None, **kwargs):
        xx = np.asarray(xx, dtype=np.float64)
        yy = np.asarray(yy, dtype=np.float64)
        order = np.argsort(xx)
        xx, yy = xx[order], np.maximum(yy[order], 0.0)
        if minimum is not None or maximum is not None:
            lo = minimum if minimum is not None else xx[0]
            hi = maximum if maximum is not None else xx[-1]
            mask = (xx >= lo) & (xx <= hi)
            xx, yy = xx[mask], yy[mask]
        # densify so the trapezoid CDF resolves the interpolated density
        # (a 2-node linear density would otherwise invert to uniform)
        if len(xx) < 256:
            dense_x = np.linspace(xx[0], xx[-1], 1024)
            yy = np.interp(dense_x, xx, yy)
            xx = dense_x
        super().__init__(name=name, latex_label=latex_label, minimum=xx[0],
                         maximum=xx[-1])
        cdf = np.concatenate([[0.0], np.cumsum(0.5 * (yy[1:] + yy[:-1])
                                               * np.diff(xx))])
        self._norm = cdf[-1]
        cdf /= cdf[-1]
        # strictly increasing CDF for stable inversion
        cdf = np.maximum.accumulate(cdf + np.arange(len(cdf)) * 1e-15)
        self.xx = jnp.asarray(xx)
        self.yy = jnp.asarray(yy / self._norm)
        self.cdf = jnp.asarray(cdf / cdf[-1])

    def transform(self, u, params=None):
        return jnp.interp(u, self.cdf, self.xx)

    def log_prob(self, x):
        dens = jnp.interp(x, self.xx, self.yy, left=0.0, right=0.0)
        return jnp.log(jnp.maximum(dens, 1e-300))



class UniformComovingVolume(Interped):
    """Luminosity-distance prior uniform in comoving volume.

    Counterpart of ``bilby.gw.prior.UniformComovingVolume`` as used in the
    reference's joint prior files (e.g.
    example_files/prior/GW170817_AT2017gfo_GRB170817A.prior:11):
    p(d_L) ~ dV_c/dd_L under the fiducial cosmology, tabulated on a dense
    d_L grid and inverted as an Interped prior.
    """

    def __init__(self, minimum, maximum, name=None, latex_label=None,
                 cosmology=None, **kwargs):
        from ..cosmology import get_cosmology
        cosmo = cosmology or get_cosmology()
        dl = np.linspace(float(minimum), float(maximum), 2048)
        z = np.interp(dl, np.asarray(cosmo.dl_grid),
                      np.asarray(cosmo.z_grid))
        # dV_c/dz ~ D_c^2 / E(z); D_c = d_L / (1 + z) (flat)
        dc = dl / (1.0 + z)
        dvc_dz = dc * dc * np.asarray(cosmo._inv_efunc(z))
        # dz/dd_L from the tabulated curve
        dz_ddl = np.gradient(z, dl)
        density = np.maximum(dvc_dz * dz_ddl, 0.0)
        super().__init__(dl, density, minimum=minimum, maximum=maximum,
                         name=name, latex_label=latex_label)


class UniformSourceFrame(Interped):
    """d_L prior uniform in comoving volume AND source-frame time:
    p(d_L) ~ (dV_c/dd_L) / (1 + z) (bilby.gw.prior.UniformSourceFrame)."""

    def __init__(self, minimum, maximum, name=None, latex_label=None,
                 cosmology=None, **kwargs):
        from ..cosmology import get_cosmology
        cosmo = cosmology or get_cosmology()
        dl = np.linspace(float(minimum), float(maximum), 2048)
        z = np.interp(dl, np.asarray(cosmo.dl_grid),
                      np.asarray(cosmo.z_grid))
        dc = dl / (1.0 + z)
        dvc_dz = dc * dc * np.asarray(cosmo._inv_efunc(z))
        dz_ddl = np.gradient(z, dl)
        density = np.maximum(dvc_dz * dz_ddl / (1.0 + z), 0.0)
        super().__init__(dl, density, minimum=minimum, maximum=maximum,
                         name=name, latex_label=latex_label)


class WeightedCategorical(Prior):
    """Discrete prior over EOS table indices with optional weights.

    Counterpart of the reference's ``WeightedCategorical``
    (nmma/eos/eos_likelihood.py ``setup_tabulated_eos_priors``:21-32):
    the unit-cube coordinate inverts the weight CDF to a category index
    in [0, ncategories). The transform returns the *float* index at the
    category midpoint so downstream ``TabulatedEOSSet.__call__`` (which
    floors) selects the category; gradients are zero (discrete).
    """

    def __init__(self, ncategories, weights=None, name=None,
                 latex_label=None):
        super().__init__(name=name, latex_label=latex_label, minimum=0.0,
                         maximum=float(ncategories))
        self.ncategories = int(ncategories)
        if weights is None:
            w = np.ones(self.ncategories, dtype=np.float64)
        else:
            w = np.asarray(weights, dtype=np.float64)
            if len(w) != self.ncategories:
                raise ValueError(
                    f"{len(w)} weights for {self.ncategories} categories")
        w = np.maximum(w, 0.0)
        self._probs = w / w.sum()
        cdf = np.concatenate([[0.0], np.cumsum(self._probs)])
        cdf[-1] = 1.0
        self._cdf = jnp.asarray(cdf)
        self._log_probs = jnp.asarray(
            np.log(np.maximum(self._probs, 1e-300)))

    def transform(self, u, params=None):
        # category = number of CDF edges below u (comparison count; no
        # searchsorted -- pathologically slow to compile on this backend)
        u = jnp.asarray(u)
        idx = jnp.sum(u[..., None] >= self._cdf[1:-1], axis=-1)
        return idx.astype(jnp.float32) + 0.5

    def log_prob(self, x):
        idx = jnp.clip(jnp.floor(jnp.asarray(x)).astype(jnp.int32), 0,
                       self.ncategories - 1)
        in_range = (x >= 0.0) & (x < self.ncategories)
        return jnp.where(in_range, self._log_probs[idx], -jnp.inf)


class Constraint(Prior):
    """Range constraint on a derived parameter; not sampled.

    Evaluated after the conversion chain: parameters violating
    [minimum, maximum] get logL = -inf (reference: bilby Constraint +
    ``evaluate_constraints``, nmma/core/base.py:274-288).
    """

    sampled = False

    def transform(self, u=None, params=None):
        raise RuntimeError("Constraint priors are never transformed")

    def log_prob(self, x):
        return jnp.where((x >= self.minimum) & (x <= self.maximum), 0.0,
                         -jnp.inf)


class ConditionalGaussianIotaGivenThetaCore(Prior):
    """Half-Gaussian on iota with width N_sigma * thetaCore.

    Counterpart of ``ConditionalGaussianIotaGivenThetaCore``
    (nmma/em/prior.py:18-77): p(iota | thetaCore) ~ half-normal centred at 0
    truncated to [minimum, maximum], sigma = N_sigma * thetaCore.
    """

    conditional = True

    def __init__(self, N_sigma=1.0, minimum=0.0, maximum=np.pi / 2,
                 name=None, latex_label=None, **kwargs):
        super().__init__(name=name, latex_label=latex_label, minimum=minimum,
                         maximum=maximum)
        self.n_sigma = float(N_sigma)

    def transform(self, u, params=None):
        from jax.scipy.special import erf
        sigma = self.n_sigma * params["thetaCore"]
        # truncated half-normal inverse CDF on [minimum, maximum]
        a = jax.scipy.special.erf(self.minimum / (jnp.sqrt(2.0) * sigma))
        b = jax.scipy.special.erf(self.maximum / (jnp.sqrt(2.0) * sigma))
        return jnp.sqrt(2.0) * sigma * jax.scipy.special.erfinv(
            a + u * (b - a))

    def log_prob(self, x):
        raise NotImplementedError("conditional log_prob requires parent")


class PriorDict:
    """Ordered prior collection with batched unit-cube transform."""

    def __init__(self, priors: dict[str, Prior]):
        self.priors = dict(priors)
        for key, p in self.priors.items():
            if p.name is None:
                p.name = key
        self.sampled_names = [k for k, p in self.priors.items()
                              if p.sampled]
        self.constraint_names = [k for k, p in self.priors.items()
                                 if isinstance(p, Constraint)]
        self.fixed = {k: p for k, p in self.priors.items()
                      if (not p.sampled) and not isinstance(p, Constraint)}

    @property
    def ndim(self):
        return len(self.sampled_names)

    def __contains__(self, key):
        return key in self.priors

    def __getitem__(self, key):
        return self.priors[key]

    def keys(self):
        return self.priors.keys()

    def transform(self, u):
        """u [..., ndim] -> {name: [...]} including fixed parameters."""
        u = jnp.asarray(u)
        params = {}
        for i, name in enumerate(self.sampled_names):
            prior = self.priors[name]
            ui = u[..., i]
            params[name] = prior.transform(ui, params) if prior.conditional \
                else prior.transform(ui)
        for name, prior in self.fixed.items():
            shape = u.shape[:-1]
            params[name] = jnp.broadcast_to(prior.transform(), shape)
        return params

    def log_prior(self, params):
        total = 0.0
        for name in self.sampled_names:
            prior = self.priors[name]
            if prior.conditional:
                continue
            total = total + prior.log_prob(params[name])
        return total

    def constraint_log_prob(self, params):
        """Sum of constraint indicators over derived parameters present."""
        total = jnp.asarray(0.0)
        for name in self.constraint_names:
            if name in params:
                total = total + self.priors[name].log_prob(params[name])
        return total

    def sample_units(self, key, n):
        return jax.random.uniform(key, (n, self.ndim))


class _SharedMultivariateGaussian:
    """Host-side Cholesky factorization shared by the per-parameter
    components of one multivariate Gaussian block."""

    def __init__(self, names, mean, cov):
        self.names = list(names)
        self.mean = np.asarray(mean, dtype=np.float64)
        cov = np.asarray(cov, dtype=np.float64)
        self.chol = np.linalg.cholesky(
            cov + 1e-12 * np.eye(len(self.mean)))
        # leading-block inverses for reconstructing the whitened
        # coordinates of earlier components
        self._inv_blocks = [None] + [
            np.linalg.inv(self.chol[:k, :k])
            for k in range(1, len(self.mean))]


class MultivariateGaussianComponent(Prior):
    """One coordinate of a correlated Gaussian prior block.

    Counterpart of bilby's ``MultivariateGaussian``/``...Dist`` as used by
    the reference's HDF5 prior surgery (``h5_to_multivar_prior``,
    nmma/core/base.py:257-272). The joint transform is the Cholesky map
    x = mean + L z with z = ndtri(u); component k is conditional on the
    earlier components (their whitened coordinates are reconstructed from
    the already-transformed values), so inserting the components in order
    into a PriorDict samples the exact joint distribution.
    """

    def __init__(self, shared: _SharedMultivariateGaussian, index: int,
                 name=None, latex_label=None):
        sigma = float(np.sqrt(np.sum(shared.chol[index, :index + 1] ** 2)))
        mu = float(shared.mean[index])
        super().__init__(name=name or shared.names[index],
                         latex_label=latex_label,
                         minimum=mu - 10 * sigma, maximum=mu + 10 * sigma)
        self.shared = shared
        self.index = int(index)
        self.conditional = self.index > 0

    def transform(self, u, params=None):
        from jax.scipy.special import ndtri
        sh = self.shared
        k = self.index
        z_k = ndtri(jnp.clip(jnp.asarray(u), 1e-7, 1.0 - 1e-7))
        x = sh.mean[k] + sh.chol[k, k] * z_k
        if k > 0:
            prev = jnp.stack([jnp.asarray(params[sh.names[j]])
                              for j in range(k)], axis=-1)
            z_prev = (prev - sh.mean[:k]) @ np.asarray(
                sh._inv_blocks[k]).T
            x = x + z_prev @ sh.chol[k, :k]
        return x

    def log_prob(self, x):
        if self.index > 0:
            raise NotImplementedError(
                "conditional log_prob requires the full block")
        mu = float(self.shared.mean[0])
        sig = float(self.shared.chol[0, 0])
        z = (jnp.asarray(x) - mu) / sig
        return -0.5 * z * z - jnp.log(sig) - 0.5 * jnp.log(2 * jnp.pi)


def multivariate_gaussian_priors(names, mean=None, cov=None, samples=None):
    """Ordered {name: prior} dict sampling a joint Gaussian.

    Either pass (mean, cov) directly, or ``samples`` [N, D] to fit them
    (the reference fits mean/cov from the HDF5 sample columns).
    """
    if samples is not None:
        samples = np.asarray(samples, dtype=np.float64)
        mean = samples.mean(axis=0)
        cov = np.cov(samples, rowvar=False)
    shared = _SharedMultivariateGaussian(names, mean, cov)
    return {name: MultivariateGaussianComponent(shared, i, name=name)
            for i, name in enumerate(shared.names)}


class NMMADummyPrior(Prior):
    """Placeholder read from a .prior file, replaced by
    ``adjust_priors_for_nmma`` (reference nmma/core/base.py:187-231):
    keys containing 'h5' become a fitted multivariate Gaussian block from
    an HDF5 sample file; keys containing 'hubble' become an Interped
    prior from a Hubble weight table."""

    sampled = False

    def __init__(self, setup_props, name=None):
        super().__init__(name=name, minimum=0.0, maximum=1.0)
        self.setup_props = setup_props

    def transform(self, u=None, params=None):
        raise RuntimeError(
            f"NMMADummyPrior('{self.setup_props}') was never replaced — "
            "call adjust_priors_for_nmma(priors) first")

    def log_prob(self, x):
        return jnp.zeros_like(jnp.asarray(x))
