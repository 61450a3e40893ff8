"""TPU-native distribution zoo: pure-function logpdf/sample, vmap- and Pallas-safe.

Rebuilds the capability surface of KernelDistributions.jl that the reference
uses inside GPU broadcasts (see SURVEY.md §2B and call sites at
/root/reference/src/Models.jl:99-162, /root/reference/src/ExperimentModels.jl:9-15,
/root/reference/src/MultipleTry.jl:119):

* ``Normal``, ``Exponential``, ``Uniform``, ``TailUniform``, ``Dirac``,
  ``truncated Exponential``, ``SmoothExponential``, ``BinaryMixture``,
  ``QuaternionUniform``, ``QuaternionNormal``, ``Gumbel``.

Design: frozen dataclasses whose parameters are jnp-broadcastable arrays.
``logpdf`` broadcasts parameters against the value; ``sample(key, shape)``
draws ``shape + broadcast_shape`` values. Every ``logpdf`` is written with
plain jnp elementwise math so the same code runs on the VPU inside Pallas
kernels, under vmap, and on CPU in tests.

Invalid-measurement convention (reference ``src/Models.jl:18``): invalid
observed depth is preprocessed to +inf; all densities except ``TailUniform``
evaluate to -inf there, which the mixtures handle in log-space without NaNs.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from . import quaternions as quat
from .bijectors import IDENTITY, LOG, LOGIT

__all__ = [
    "Normal",
    "Exponential",
    "TruncatedExponential",
    "SmoothExponential",
    "Uniform",
    "TailUniform",
    "Dirac",
    "BinaryMixture",
    "QuaternionUniform",
    "QuaternionNormal",
    "Gumbel",
    "MvNormal",
    "bijector_of",
    "broadcast_shape_of",
]

_NEG_INF = -jnp.inf


def _log1mexp(a):
    """log(1 - exp(a)) for a <= 0, without log1p/expm1 (absent in Mosaic).
    Accurate enough for the truncation normalizers used here (|a| >~ 1e-3)."""
    return jnp.log(jnp.maximum(1.0 - jnp.exp(a), 1e-38))


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 erf (|err| < 1.5e-7), built from exp and
    polynomials only — Mosaic (Pallas TPU) has no erf primitive."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def log_ndtr(x):
    """Kernel-safe log of the standard normal CDF.

    jax.scipy.special.log_ndtr lowers to erf, which Mosaic does not
    implement; this version combines the A&S erf approximation (x > -5,
    absolute error < 1.5e-7) with the asymptotic expansion
    log Φ(x) ~ -x²/2 - log(-x√(2π)) + log(1 - 1/x²) for the far tail.
    """
    x = jnp.asarray(x)
    half = jnp.asarray(0.5, x.dtype)
    sqrt_half = jnp.asarray(0.7071067811865476, x.dtype)
    # body: Φ(x) = 0.5 (1 + erf(x/√2)), used for x > -4
    xb = jnp.maximum(x, -4.0)
    body = jnp.log(jnp.maximum(half * (1.0 + _erf_approx(xb * sqrt_half)), 1e-38))
    # tail: x <= -4 (3-term asymptotic series)
    xt = jnp.minimum(x, -4.0)
    inv2 = 1.0 / (xt * xt)
    tail = (-half * xt * xt - jnp.log(-xt * jnp.asarray(2.5066282746310002, x.dtype))
            + jnp.log(1.0 - inv2 + 3.0 * inv2 * inv2 - 15.0 * inv2 * inv2 * inv2))
    return jnp.where(x > -4.0, body, tail)


def _register(cls):
    """Register a distribution dataclass as a pytree (params are leaves)."""
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(d):
        return tuple(getattr(d, n) for n in fields), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def _bshape(*args):
    import numpy as _np

    return jnp.broadcast_shapes(*(_np.shape(a) for a in args))


def broadcast_shape_of(dist) -> tuple:
    """Broadcast shape of the distribution's parameters."""
    leaves = jax.tree_util.tree_leaves(dist)
    if not leaves:
        return ()
    return _bshape(*leaves)


# --------------------------------------------------------------------------- #
# Scalar-family distributions
# --------------------------------------------------------------------------- #


@_register
@dataclass(frozen=True)
class Normal:
    """Gaussian; parity: ``KernelNormal(μ, σ)``."""

    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, x):
        loc = jnp.asarray(self.loc)
        scale = jnp.asarray(self.scale)
        z = (x - loc) / scale
        # x=+inf (invalid measurement) gives z=inf -> -inf without NaN
        return -0.5 * z * z - jnp.log(scale) - 0.5 * jnp.log(2.0 * jnp.pi).astype(jnp.result_type(x, loc))

    def sample(self, key, shape=()):
        b = _bshape(self.loc, self.scale)
        dtype = jnp.result_type(jnp.asarray(self.loc).dtype, jnp.asarray(self.scale).dtype)
        eps = jax.random.normal(key, (*shape, *b), dtype=dtype)
        return jnp.asarray(self.loc) + jnp.asarray(self.scale) * eps

    @property
    def bijector(self):
        return IDENTITY


@_register
@dataclass(frozen=True)
class Exponential:
    """Exponential with *mean* θ (Julia ``KernelExponential(θ)`` convention):
    pdf(x) = exp(-x/θ)/θ on [0, inf)."""

    theta: Any = 1.0

    def logpdf(self, x):
        theta = jnp.asarray(self.theta)
        valid = x >= 0
        ll = -jnp.where(valid, x, 0.0) / theta - jnp.log(theta)
        return jnp.where(valid, ll, _NEG_INF)

    def sample(self, key, shape=()):
        theta = jnp.asarray(self.theta)
        b = _bshape(theta)
        u = jax.random.exponential(key, (*shape, *b), dtype=theta.dtype if theta.dtype.kind == "f" else jnp.float32)
        return theta * u

    @property
    def bijector(self):
        return LOG


@_register
@dataclass(frozen=True)
class TruncatedExponential:
    """Exponential(mean θ) truncated to [low, high].

    Parity: ``truncated(KernelExponential(θ), nothing, μ)`` in
    /root/reference/src/Models.jl:128-140. The reference guards μ<=0 by using
    an infinite-θ exponential whose density is zero everywhere; we reproduce
    that with a ``jnp.where`` on ``high > low``.
    """

    theta: Any = 1.0
    low: Any = 0.0
    high: Any = jnp.inf

    def logpdf(self, x):
        theta = jnp.asarray(self.theta)
        low = jnp.asarray(self.low)
        high = jnp.asarray(self.high)
        inside = (x >= low) & (x <= high)
        # log normalizer: P(low <= X <= high) = exp(-low/θ) - exp(-high/θ)
        # stable form: -low/θ + log1p(-exp(-(high-low)/θ))
        span = (high - low) / theta
        ok = span > 0
        log_z = -low / theta + _log1mexp(-jnp.where(ok, span, 1.0))
        ll = -jnp.where(inside, x, 0.0) / theta - jnp.log(theta) - log_z
        return jnp.where(inside & ok, ll, _NEG_INF)

    def sample(self, key, shape=()):
        theta = jnp.asarray(self.theta)
        low = jnp.asarray(self.low)
        high = jnp.asarray(self.high)
        b = _bshape(theta, low, high)
        u = jax.random.uniform(key, (*shape, *b))
        # inverse cdf of the truncated exponential
        cl = -jnp.expm1(-low / theta)
        ch = -jnp.expm1(-high / theta)
        c = cl + u * (ch - cl)
        return -theta * jnp.log1p(-c)

    @property
    def bijector(self):
        return LOG


@_register
@dataclass(frozen=True)
class SmoothExponential:
    """Exponential decay on [low, high] convolved with sensor noise N(0, σ²).

    Models occlusions in front of the expected depth with a smooth (instead of
    hard) truncation — the reference's ``SmoothExponential(min, max, θ, σ)``
    used by ``smooth_tail`` (/root/reference/src/Models.jl:156-162).

    Closed form (exponentially modified Gaussian restricted to the window):

        f(z) = exp(σ²/(2θ²) - (z-low)/θ) / (θ Z)
               * [Φ((z-low)/σ - σ/θ) - Φ((z-high)/σ - σ/θ)]
        Z    = 1 - exp(-(high-low)/θ)

    For high <= low (e.g. invalid render μ=0) the density is zero everywhere,
    mirroring the reference's infinite-θ guard.
    """

    low: Any = 0.0
    high: Any = 1.0
    theta: Any = 1.0
    sigma: Any = 0.01

    def logpdf(self, x):
        theta = jnp.asarray(self.theta)
        sigma = jnp.asarray(self.sigma)
        low = jnp.asarray(self.low)
        high = jnp.asarray(self.high)
        span = high - low
        ok = span > 0
        # guard x=+inf: the two log_ndtr terms cancel to log(0) = -inf cleanly
        finite_x = jnp.isfinite(x)
        xs = jnp.where(finite_x, x, 0.0)
        a = (xs - low) / sigma - sigma / theta
        b = (xs - high) / sigma - sigma / theta
        la = log_ndtr(a)
        lb = log_ndtr(b)
        # log(Φ(a) - Φ(b)) = la + log1p(-exp(lb - la)), guarded for la == lb
        diff = jnp.clip(lb - la, max=0.0)
        log_window = la + _log1mexp(jnp.minimum(diff, -1e-12))
        log_z = _log1mexp(-jnp.where(ok, span, 1.0) / theta)
        ll = (
            0.5 * (sigma / theta) ** 2
            - (xs - low) / theta
            - jnp.log(theta)
            - log_z
            + log_window
        )
        return jnp.where(ok & finite_x, ll, _NEG_INF)

    def sample(self, key, shape=()):
        k1, k2 = jax.random.split(key)
        trunc = TruncatedExponential(self.theta, self.low, self.high)
        base = trunc.sample(k1, shape)
        noise = jnp.asarray(self.sigma) * jax.random.normal(k2, base.shape, dtype=base.dtype)
        return base + noise

    @property
    def bijector(self):
        return IDENTITY  # support is effectively all of R after smoothing


@_register
@dataclass(frozen=True)
class Uniform:
    """Uniform on [low, high]; -inf outside the support."""

    low: Any = 0.0
    high: Any = 1.0

    def logpdf(self, x):
        low = jnp.asarray(self.low)
        high = jnp.asarray(self.high)
        inside = (x >= low) & (x <= high)
        return jnp.where(inside, -jnp.log(high - low), _NEG_INF)

    def sample(self, key, shape=()):
        low = jnp.asarray(self.low)
        high = jnp.asarray(self.high)
        b = _bshape(low, high)
        u = jax.random.uniform(key, (*shape, *b), dtype=jnp.result_type(low, high))
        return low + u * (high - low)

    @property
    def bijector(self):
        return LOGIT


@_register
@dataclass(frozen=True)
class TailUniform:
    """Uniform density everywhere — including outside [low, high] and at +inf.

    This is the long-tail component that keeps invalid measurements (z=inf)
    from zeroing a whole image likelihood (see /root/reference/src/Models.jl:18
    and the ``TailUniform`` usage at :108, :137, :159). The density integrates
    to 1 over [low, high] but is deliberately *not* zero outside.
    """

    low: Any = 0.0
    high: Any = 1.0

    def logpdf(self, x):
        low = jnp.asarray(self.low)
        high = jnp.asarray(self.high)
        return jnp.broadcast_to(-jnp.log(high - low), _bshape(x, low, high))

    def sample(self, key, shape=()):
        return Uniform(self.low, self.high).sample(key, shape)

    @property
    def bijector(self):
        return IDENTITY


@_register
@dataclass(frozen=True)
class Dirac:
    """Point mass; parity: ``KernelDirac`` (/root/reference/src/ExperimentModels.jl:52).

    logpdf is 0 at the atom and -inf elsewhere."""

    value: Any = 0.0

    def logpdf(self, x):
        v = jnp.asarray(self.value)
        return jnp.where(x == v, 0.0, _NEG_INF)

    def sample(self, key, shape=()):
        v = jnp.asarray(self.value)
        return jnp.broadcast_to(v, (*shape, *jnp.shape(v)))

    @property
    def bijector(self):
        return IDENTITY


@_register
@dataclass(frozen=True)
class Gumbel:
    """Standard Gumbel; used for Gumbel-max categorical selection in MTM
    (parity: /root/reference/src/MultipleTry.jl:119)."""

    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, x):
        z = (x - jnp.asarray(self.loc)) / jnp.asarray(self.scale)
        return -(z + jnp.exp(-z)) - jnp.log(jnp.asarray(self.scale))

    def sample(self, key, shape=()):
        b = _bshape(self.loc, self.scale)
        g = jax.random.gumbel(key, (*shape, *b))
        return jnp.asarray(self.loc) + jnp.asarray(self.scale) * g

    @property
    def bijector(self):
        return IDENTITY


@_register
@dataclass(frozen=True)
class BinaryMixture:
    """Two-component mixture with (unnormalized) weights w1, w2 in log space.

    Parity: KernelDistributions' ``BinaryMixture`` used for the pixel models
    (/root/reference/src/Models.jl:99-162). logpdf is evaluated with
    ``logaddexp`` so a -inf component degrades gracefully.
    """

    dist_a: Any = None
    dist_b: Any = None
    weight_a: Any = 1.0
    weight_b: Any = 1.0

    def logpdf(self, x):
        wa = jnp.asarray(self.weight_a)
        wb = jnp.asarray(self.weight_b)
        log_norm = jnp.log(wa + wb)
        la = jnp.log(wa) - log_norm + self.dist_a.logpdf(x)
        lb = jnp.log(wb) - log_norm + self.dist_b.logpdf(x)
        # logaddexp handles -inf on either side; guard the double -inf case
        return jnp.logaddexp(la, lb)

    def sample(self, key, shape=()):
        ka, kb, kc = jax.random.split(key, 3)
        a = self.dist_a.sample(ka, shape)
        b = self.dist_b.sample(kb, shape)
        wa = jnp.asarray(self.weight_a)
        wb = jnp.asarray(self.weight_b)
        pick_a = jax.random.uniform(kc, jnp.broadcast_shapes(a.shape, b.shape)) < wa / (wa + wb)
        return jnp.where(pick_a, a, b)

    @property
    def bijector(self):
        return IDENTITY


# --------------------------------------------------------------------------- #
# Quaternion distributions
# --------------------------------------------------------------------------- #

# Surface area of the unit 3-sphere; uniform density w.r.t. the S^3 measure.
# math.log, NOT jnp.log: a jnp op here would initialize the device backend at
# package import, turning a wedged TPU tunnel into an import-time hang for
# every entry point (bench, host-only scripts). See tests/test_import_hostonly.py.
_LOG_SURFACE_S3 = math.log(2.0 * math.pi**2)


@dataclass(frozen=True)
class QuaternionUniform:
    """Uniform distribution over unit quaternions (Haar on S^3).

    Parity: ``QuaternionUniform`` prior (/root/reference/src/ExperimentModels.jl:11).
    Values are [..., 4] (w, x, y, z). The constant logpdf only matters through
    differences, which cancel in MH ratios.
    """

    dtype: Any = dataclasses.field(default=jnp.float32, metadata={"static": True})

    def logpdf(self, x):
        return jnp.full(jnp.shape(x)[:-1], -_LOG_SURFACE_S3, dtype=jnp.result_type(x))

    def sample(self, key, shape=()):
        return quat.rand_quaternion(key, shape, dtype=self.dtype)

    @property
    def bijector(self):
        return IDENTITY


# QuaternionUniform carries only a static dtype; fix its pytree to be leafless.
jax.tree_util.register_pytree_node(
    QuaternionUniform,
    lambda d: ((), d.dtype),
    lambda dtype, _: QuaternionUniform(dtype),
)


@_register
@dataclass(frozen=True)
class QuaternionNormal:
    """Tangent-space Gaussian around a mean quaternion: q = q0 ⊕ v, v ~ N(0, σ²I₃).

    Parity: ``QuaternionNormal`` used by the particle-filter prior
    (/root/reference/src/ParticleFilter.jl:110).
    """

    loc: Any = None  # [..., 4]
    scale: Any = 0.1

    def logpdf(self, x):
        v = quat.qminus(x, jnp.asarray(self.loc))
        return jnp.sum(Normal(0.0, jnp.asarray(self.scale)).logpdf(v), axis=-1)

    def sample(self, key, shape=()):
        loc = jnp.asarray(self.loc)
        b = jnp.broadcast_shapes(loc.shape[:-1], jnp.shape(self.scale))
        v = jnp.asarray(self.scale) * jax.random.normal(key, (*shape, *b, 3), dtype=loc.dtype)
        return quat.qplus(loc, v)

    @property
    def bijector(self):
        return IDENTITY


@_register
@dataclass(frozen=True)
class MvNormal:
    """Zero-centered multivariate normal with full covariance, for the SMC
    adaptive proposal (parity: /root/reference/src/SequentialMonteCarlo.jl:226-229).

    ``cov`` is [d, d]; samples are [..., d].
    """

    cov: Any = None

    def logpdf(self, x):
        cov = jnp.asarray(self.cov)
        chol = jnp.linalg.cholesky(cov)
        d = cov.shape[-1]
        # small d (3 for translations): explicit precision is cheap & batch-safe
        prec = jnp.linalg.inv(cov)
        quad = jnp.einsum("...i,ij,...j->...", x, prec, x)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
        return -0.5 * (quad + logdet + d * jnp.log(2.0 * jnp.pi))

    def sample(self, key, shape=()):
        cov = jnp.asarray(self.cov)
        chol = jnp.linalg.cholesky(cov)
        d = cov.shape[-1]
        eps = jax.random.normal(key, (*shape, d), dtype=cov.dtype)
        return eps @ chol.T

    @property
    def bijector(self):
        return IDENTITY


def bijector_of(dist):
    """Bijector mapping the distribution's support to R^n."""
    return dist.bijector
