"""Per-pixel depth observation models: mixtures, analytic association, regularizers.

Parity targets (formula-for-formula) in /root/reference/src/Models.jl:
* ``pixel_mixture`` / ``pixel_tail``            (:99-111)
* ``truncated_mixture`` / ``truncated_tail``    (:121-140)
* ``smooth_mixture`` / ``smooth_tail``          (:150-162)
* ``marginalized_association``                  (:187-198)
* ``pixel/truncated/smooth_association_fn``     (:207-237)
* ``ImageLikelihoodNormalizer`` / ``SimpleImageRegularization`` (:47-87)

Everything here is plain elementwise jnp math so it can be inlined into the
fused Pallas render+score kernel as well as evaluated standalone (CPU tests,
golden-value parity checks).

Argument convention matches the reference: ``(min_depth, max_depth, θ, σ, μ, o)``
where ``μ`` is the rendered (expected) depth and ``o`` the association
probability; the observed depth ``z`` is the evaluation point.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..distributions import (
    BinaryMixture,
    Exponential,
    Normal,
    SmoothExponential,
    TailUniform,
    TruncatedExponential,
)

__all__ = [
    "pixel_mixture",
    "pixel_tail",
    "truncated_mixture",
    "truncated_tail",
    "smooth_mixture",
    "smooth_tail",
    "pixel_normal",
    "marginalized_association",
    "pixel_association_fn",
    "truncated_association_fn",
    "smooth_association_fn",
    "uniform_pixel_mixture",
    "uniform_association_fn",
    "logdensity_npixel",
    "image_likelihood_normalizer",
    "simple_image_regularization",
]


# --------------------------------------------------------------------------- #
# Pixel distributions (distribution constructors, mirroring the reference)
# --------------------------------------------------------------------------- #


def pixel_normal(sigma, mu):
    """KernelNormal(μ, σ) (parity: /root/reference/src/Models.jl:164)."""
    return Normal(mu, sigma)


def pixel_tail(min_depth, max_depth, theta, sigma, mu):
    """Occlusion (exponential) + outlier (tail-uniform) mixture
    (parity: /root/reference/src/Models.jl:106-111)."""
    return BinaryMixture(Exponential(theta), TailUniform(min_depth, max_depth), 1.0, 1.0)


def pixel_mixture(min_depth, max_depth, theta, sigma, mu, o):
    """o * Normal(μ, σ) + (1-o) * tail (parity: /root/reference/src/Models.jl:99-104)."""
    return BinaryMixture(Normal(mu, sigma), pixel_tail(min_depth, max_depth, theta, sigma, mu), o, 1.0 - o)


def truncated_tail(min_depth, max_depth, theta, sigma, mu):
    """Tail with the exponential truncated at μ; for μ <= 0 the exponential
    contributes zero density (parity: /root/reference/src/Models.jl:128-140,
    including the μ=0 guard at :129-135 realized via TruncatedExponential's
    ``high > low`` gate)."""
    exponential = TruncatedExponential(theta, 0.0, mu)
    return BinaryMixture(exponential, TailUniform(min_depth, max_depth), 1.0, 1.0)


def truncated_mixture(min_depth, max_depth, theta, sigma, mu, o):
    """(parity: /root/reference/src/Models.jl:121-125)"""
    return BinaryMixture(
        Normal(mu, sigma), truncated_tail(min_depth, max_depth, theta, sigma, mu), o, 1.0 - o
    )


def smooth_tail(min_depth, max_depth, theta, sigma, mu):
    """Tail with a smoothly truncated exponential on [0, μ]
    (parity: /root/reference/src/Models.jl:156-162; occlusions may occur in
    front of min_depth, hence the lower bound 0)."""
    exponential = SmoothExponential(0.0, mu, theta, sigma)
    return BinaryMixture(exponential, TailUniform(min_depth, max_depth), 1.0, 1.0)


def smooth_mixture(min_depth, max_depth, theta, sigma, mu, o):
    """(parity: /root/reference/src/Models.jl:150-154)"""
    return BinaryMixture(
        Normal(mu, sigma), smooth_tail(min_depth, max_depth, theta, sigma, mu), o, 1.0 - o
    )


# --------------------------------------------------------------------------- #
# Analytic pixel association (collapsed-Gibbs classification)
# --------------------------------------------------------------------------- #


def marginalized_association(logpdf_is, logpdf_not, prior, mu, z):
    """Posterior association probability o = prior*p_is / (prior*p_is + (1-prior)*p_not).

    ``logpdf_is(mu, z)`` / ``logpdf_not(mu, z)`` evaluate the "belongs to the
    object" / "does not belong" densities. Limit cases return the prior when
    prior∈{0,1} or μ==0 (invalid render), matching
    /root/reference/src/Models.jl:187-198. Computed in log space for stability.
    """
    l_is = jnp.log(prior) + logpdf_is(mu, z)
    l_not = jnp.log(jnp.maximum(1.0 - prior, 1e-38)) + logpdf_not(mu, z)
    post = jnp.exp(l_is - jnp.logaddexp(l_is, l_not))
    limit = (prior <= 0.0) | (prior >= 1.0) | (mu <= 0.0)
    return jnp.where(limit, prior, post)


def pixel_association_fn(params):
    """fn(prior, μ, z) with Normal "is" and exponential+uniform "not"
    (parity: /root/reference/src/Models.jl:207-211)."""

    def logpdf_is(mu, z):
        return pixel_normal(params.association_sigma, mu).logpdf(z)

    def logpdf_not(mu, z):
        return pixel_tail(params.min_depth, params.max_depth, params.pixel_theta,
                          params.association_sigma, mu).logpdf(z)

    def fn(prior, mu, z):
        return marginalized_association(logpdf_is, logpdf_not, prior, mu, z)

    return fn


def uniform_pixel_mixture(min_depth, max_depth, sigma, mu, o):
    """o * Normal(μ, σ) + (1-o) * TailUniform — the :no_exp ablation model
    without the exponential occlusion component
    (parity: /root/reference/scripts/smc_observation.jl:60-65)."""
    return BinaryMixture(Normal(mu, sigma), TailUniform(min_depth, max_depth),
                         o, 1.0 - o)


def uniform_association_fn(params):
    """Normal "is" vs TailUniform "not" — no occlusion component
    (parity: /root/reference/scripts/smc_observation.jl:66-71)."""

    def logpdf_is(mu, z):
        return pixel_normal(params.association_sigma, mu).logpdf(z)

    def logpdf_not(mu, z):
        return TailUniform(params.min_depth, params.max_depth).logpdf(z)

    def fn(prior, mu, z):
        return marginalized_association(logpdf_is, logpdf_not, prior, mu, z)

    return fn


def truncated_association_fn(params):
    """(parity: /root/reference/src/Models.jl:220-224)"""

    def logpdf_is(mu, z):
        return pixel_normal(params.association_sigma, mu).logpdf(z)

    def logpdf_not(mu, z):
        return truncated_tail(params.min_depth, params.max_depth, params.pixel_theta,
                              params.association_sigma, mu).logpdf(z)

    def fn(prior, mu, z):
        return marginalized_association(logpdf_is, logpdf_not, prior, mu, z)

    return fn


def smooth_association_fn(params):
    """(parity: /root/reference/src/Models.jl:233-237)"""

    def logpdf_is(mu, z):
        return pixel_normal(params.association_sigma, mu).logpdf(z)

    def logpdf_not(mu, z):
        return smooth_tail(params.min_depth, params.max_depth, params.pixel_theta,
                           params.association_sigma, mu).logpdf(z)

    def fn(prior, mu, z):
        return marginalized_association(logpdf_is, logpdf_not, prior, mu, z)

    return fn


# --------------------------------------------------------------------------- #
# Image-level regularization
# --------------------------------------------------------------------------- #


def logdensity_npixel(ell, c_reg, n_pixel):
    """c_reg / n_pixel * ℓ with the n_pixel==0 -> -inf guard
    (parity: /root/reference/src/Models.jl:71)."""
    safe = jnp.where(n_pixel == 0, 1.0, n_pixel)
    return jnp.where(n_pixel == 0, -jnp.inf, c_reg / safe * ell)


def image_likelihood_normalizer(c_reg, ell, o, pixel_axes=(-2, -1)):
    """ℓ_reg = c_reg / Σo * ℓ — normalize by the *expected number of visible
    object pixels* (parity: ImageLikelihoodNormalizer,
    /root/reference/src/Models.jl:47-62)."""
    n_o = jnp.sum(o, axis=pixel_axes)
    return logdensity_npixel(ell, c_reg, n_o)


def simple_image_regularization(c_reg, ell, n_pixels):
    """ℓ_reg = c_reg / n_pixels * ℓ (parity: SimpleImageRegularization,
    /root/reference/src/Models.jl:81-87)."""
    return logdensity_npixel(ell, c_reg, n_pixels)
