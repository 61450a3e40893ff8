"""Golden-value tests for the pixel likelihood & analytic association.

Parity targets: /root/reference/src/Models.jl formulas and the closed-form
Bayes check from /root/reference/test/association_model.jl:45-59.
"""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from bayesianposeestimation.jl_tpu.models import pixel as P

PARAMS = SimpleNamespace(
    min_depth=0.5,
    max_depth=1.5,
    pixel_theta=1.0,
    pixel_sigma=0.01,
    association_sigma=0.01,
)


def manual_pixel_mixture_logpdf(min_d, max_d, theta, sigma, mu, o, z):
    """Closed-form reference implementation with scipy, in log domain
    (the reference's BinaryMixture also evaluates in log space)."""
    log_normal = stats.norm.logpdf(z, mu, sigma) if np.isfinite(z) else -np.inf
    log_exp = stats.expon.logpdf(z, scale=theta) if np.isfinite(z) else -np.inf
    log_uniform = -np.log(max_d - min_d)  # TailUniform: constant everywhere
    log_tail = np.logaddexp(np.log(0.5) + log_exp, np.log(0.5) + log_uniform)
    with np.errstate(divide="ignore"):
        return np.logaddexp(np.log(o) + log_normal, np.log1p(-o) + log_tail)


@pytest.mark.parametrize("z", [0.6, 1.0, 1.49, 2.5, np.inf])
@pytest.mark.parametrize("o", [0.0, 0.3, 1.0])
def test_pixel_mixture_golden(z, o):
    mu = 1.0
    d = P.pixel_mixture(0.5, 1.5, 1.0, 0.01, mu, o)
    expected = manual_pixel_mixture_logpdf(0.5, 1.5, 1.0, 0.01, mu, o, z)
    got = float(d.logpdf(jnp.float32(z)))
    if np.isneginf(expected):
        assert np.isneginf(got)
    else:
        assert got == pytest.approx(expected, rel=1e-4, abs=1e-3)


def test_truncated_mixture_at_invalid_mu():
    # μ=0: exponential suppressed, only uniform tail remains
    d = P.truncated_mixture(0.5, 1.5, 1.0, 0.01, 0.0, 0.5)
    z = jnp.float32(1.0)
    # o*Normal(0,σ)(1) ~ 0; (1-o)*0.5*uniform remains
    expected = np.log(0.5 * 0.5 * 1.0)
    assert float(d.logpdf(z)) == pytest.approx(expected, rel=1e-3)


def test_smooth_mixture_finite():
    d = P.smooth_mixture(0.5, 1.5, 1.0, 0.01, 1.0, 0.7)
    assert np.isfinite(float(d.logpdf(jnp.float32(0.95))))
    assert np.isfinite(float(d.logpdf(jnp.float32(jnp.inf))))  # tail uniform catches inf


def test_marginalized_association_closed_form():
    """Check against the closed-form Bayes formula
    (parity: /root/reference/test/association_model.jl:45-59)."""
    fn = P.pixel_association_fn(PARAMS)
    prior, mu, z = 0.7, 1.0, 1.005
    got = float(fn(jnp.float32(prior), jnp.float32(mu), jnp.float32(z)))
    p_is = stats.norm.pdf(z, mu, PARAMS.association_sigma)
    p_not = 0.5 * stats.expon.pdf(z, scale=1.0) + 0.5 * 1.0
    expected = prior * p_is / (prior * p_is + (1 - prior) * p_not)
    assert got == pytest.approx(expected, rel=1e-4)


@pytest.mark.parametrize("prior", [0.0, 1.0])
def test_association_limit_prior(prior):
    fn = P.pixel_association_fn(PARAMS)
    assert float(fn(jnp.float32(prior), jnp.float32(1.0), jnp.float32(1.0))) == prior


def test_association_limit_invalid_mu():
    fn = P.pixel_association_fn(PARAMS)
    # μ=0 -> return prior (no update possible)
    assert float(fn(jnp.float32(0.4), jnp.float32(0.0), jnp.float32(1.0))) == pytest.approx(0.4)


def test_association_far_measurement_low():
    fn = P.pixel_association_fn(PARAMS)
    # measurement far behind the render: not the object
    got = float(fn(jnp.float32(0.7), jnp.float32(1.0), jnp.float32(1.4)))
    assert got < 0.01


def test_smooth_association_behaves():
    fn = P.smooth_association_fn(PARAMS)
    close = float(fn(jnp.float32(0.5), jnp.float32(1.0), jnp.float32(1.002)))
    far = float(fn(jnp.float32(0.5), jnp.float32(1.0), jnp.float32(1.3)))
    assert close > 0.9
    assert far < 0.1


def test_regularizers():
    ell = jnp.float32(-500.0)
    # SimpleImageRegularization: c_reg / n_pixels * ℓ
    assert float(P.simple_image_regularization(50.0, ell, 900)) == pytest.approx(-500.0 * 50 / 900)
    # ImageLikelihoodNormalizer: c_reg / Σo * ℓ
    o = jnp.full((30, 30), 0.5)
    got = P.image_likelihood_normalizer(50.0, ell, o)
    assert float(got) == pytest.approx(-500.0 * 50 / 450)
    # zero visible pixels -> -inf (Models.jl:71)
    assert float(P.image_likelihood_normalizer(50.0, ell, jnp.zeros((4, 4)))) == -np.inf


def test_vectorized_over_particles():
    """Everything broadcasts over a particle batch dim — the core TPU axis."""
    n, h, w = 7, 8, 8
    mu = jnp.linspace(0.6, 1.4, n)[:, None, None] * jnp.ones((n, h, w))
    o = jnp.full((n, h, w), 0.7)
    z = jnp.full((h, w), 1.0)
    d = P.pixel_mixture(0.5, 1.5, 1.0, 0.01, mu, o)
    ll = d.logpdf(z)
    assert ll.shape == (n, h, w)
    assert bool(jnp.all(jnp.isfinite(ll)))


def test_uniform_mixture_no_occlusion():
    """The :no_exp model has NO density bump in front of the surface — an
    occluder reads as pure outlier (smc_observation.jl:60-71)."""
    import jax.numpy as jnp
    import numpy as np

    from bayesianposeestimation.jl_tpu.models.pixel import (
        pixel_mixture,
        uniform_association_fn,
        uniform_pixel_mixture,
    )
    from bayesianposeestimation.jl_tpu.parameters import Parameters

    mu, o = 1.0, 0.8
    occluded_z = 0.5  # in front of the surface
    with_exp = pixel_mixture(0.1, 2.0, 1.0, 0.01, mu, o).logpdf(occluded_z)
    no_exp = uniform_pixel_mixture(0.1, 2.0, 0.01, mu, o).logpdf(occluded_z)
    assert float(with_exp) > float(no_exp)  # exp tail explains the occluder

    fn = uniform_association_fn(Parameters(association_sigma=0.01))
    on_surface = float(fn(jnp.float32(0.5), jnp.float32(mu), jnp.float32(mu)))
    occluded = float(fn(jnp.float32(0.5), jnp.float32(mu), jnp.float32(occluded_z)))
    assert on_surface > 0.95
    assert occluded < 0.5
    assert float(fn(jnp.float32(0.5), jnp.float32(0.0), jnp.float32(1.0))) == 0.5
    np.testing.assert_allclose(
        float(fn(jnp.float32(1.0), jnp.float32(mu), jnp.float32(occluded_z))), 1.0)
