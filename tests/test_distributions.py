"""Distribution zoo: logpdf golden values, normalization, sampling moments.

Mirrors the reference's pure-math unit layer (SURVEY.md §4) with numerical
parity targets for the formulas in /root/reference/src/Models.jl.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from bayesianposeestimation.jl_tpu import distributions as D
from bayesianposeestimation.jl_tpu import quaternions as q


def test_normal_matches_scipy():
    d = D.Normal(1.3, 0.7)
    x = np.linspace(-3, 5, 17, dtype=np.float32)
    np.testing.assert_allclose(d.logpdf(x), stats.norm.logpdf(x, 1.3, 0.7), rtol=1e-4)


def test_normal_invalid_measurement():
    d = D.Normal(1.0, 0.1)
    assert d.logpdf(jnp.inf) == -jnp.inf
    assert np.isfinite(d.logpdf(0.0))


def test_exponential_mean_parameterization():
    # KernelExponential(θ) has MEAN θ (Julia convention)
    d = D.Exponential(2.0)
    x = np.linspace(0, 8, 9, dtype=np.float32)
    np.testing.assert_allclose(d.logpdf(x), stats.expon.logpdf(x, scale=2.0), rtol=1e-5)
    assert d.logpdf(-0.5) == -jnp.inf
    assert d.logpdf(jnp.inf) == -jnp.inf


def test_truncated_exponential():
    d = D.TruncatedExponential(theta=0.8, low=0.0, high=1.1)
    ref = stats.truncexpon(b=1.1 / 0.8, scale=0.8)
    x = np.linspace(0.01, 1.05, 13, dtype=np.float32)
    np.testing.assert_allclose(d.logpdf(x), ref.logpdf(x), atol=5e-4)
    assert d.logpdf(1.2) == -jnp.inf
    # μ<=0 guard (reference Models.jl:129-135): no density anywhere
    dz = D.TruncatedExponential(theta=0.8, low=0.0, high=0.0)
    assert dz.logpdf(0.0) == -jnp.inf


def test_smooth_exponential_normalizes():
    d = D.SmoothExponential(low=0.0, high=1.0, theta=1.0, sigma=0.05)
    x = jnp.linspace(-0.5, 1.5, 4001)
    total = float(jnp.trapezoid(jnp.exp(d.logpdf(x)), x))
    assert total == pytest.approx(1.0, abs=2e-3)


def test_smooth_exponential_is_smoothed_truncated():
    """Far from the boundaries the smooth version matches the hard truncation."""
    smooth = D.SmoothExponential(low=0.0, high=1.0, theta=1.0, sigma=0.01)
    hard = D.TruncatedExponential(theta=1.0, low=0.0, high=1.0)
    x = np.linspace(0.1, 0.9, 9, dtype=np.float32)
    np.testing.assert_allclose(smooth.logpdf(x), hard.logpdf(x), atol=1e-3)


def test_smooth_exponential_guards():
    d = D.SmoothExponential(low=0.0, high=0.0, theta=1.0, sigma=0.05)
    assert d.logpdf(0.3) == -jnp.inf
    d2 = D.SmoothExponential(low=0.0, high=1.0, theta=1.0, sigma=0.05)
    assert d2.logpdf(jnp.inf) == -jnp.inf
    assert np.isfinite(d2.logpdf(0.5))


def test_tail_uniform_constant_everywhere():
    d = D.TailUniform(0.5, 1.5)
    expected = -np.log(1.0)
    for x in [0.0, 0.5, 1.0, 2.0, np.inf]:
        assert float(d.logpdf(jnp.float32(x))) == pytest.approx(expected, abs=1e-6)


def test_binary_mixture_weights():
    a = D.Normal(0.0, 1.0)
    b = D.Normal(5.0, 1.0)
    mix = D.BinaryMixture(a, b, 3.0, 1.0)
    x = jnp.float32(1.0)
    manual = np.logaddexp(
        np.log(0.75) + float(a.logpdf(x)), np.log(0.25) + float(b.logpdf(x))
    )
    assert float(mix.logpdf(x)) == pytest.approx(manual, rel=1e-4)


def test_binary_mixture_with_neg_inf_component():
    mix = D.BinaryMixture(D.Exponential(1.0), D.TailUniform(0.0, 2.0), 1.0, 1.0)
    # at x=inf only the tail contributes
    expected = np.log(0.5) + float(D.TailUniform(0.0, 2.0).logpdf(jnp.inf))
    assert float(mix.logpdf(jnp.inf)) == pytest.approx(expected, rel=1e-5)


def test_dirac():
    d = D.Dirac(1.5)
    assert float(d.logpdf(1.5)) == 0.0
    assert d.logpdf(1.0) == -jnp.inf
    assert d.sample(jax.random.PRNGKey(0), (3,)).shape == (3,)


def test_quaternion_uniform(key):
    d = D.QuaternionUniform()
    s = d.sample(key, (10,))
    assert s.shape == (10, 4)
    np.testing.assert_allclose(jnp.linalg.norm(s, axis=-1), 1.0, atol=1e-5)
    assert np.allclose(d.logpdf(s), -np.log(2 * np.pi**2))


def test_quaternion_normal(key):
    loc = q.qexp(jnp.array([0.3, -0.2, 0.1]))
    d = D.QuaternionNormal(loc, 0.05)
    s = d.sample(key, (5000,))
    dists = q.quat_dist(s, loc)
    # small-angle: rotation angle |v| ~ chi(3)*σ with mean ≈ 1.5958σ;
    # quat_dist returns HALF the angle (reference Common.jl:136 formula)
    assert float(jnp.mean(dists)) == pytest.approx(0.05 * 1.5958 / 2, rel=0.05)
    assert np.isfinite(float(d.logpdf(s[0])))


def test_mvnormal(key):
    cov = jnp.asarray([[0.04, 0.01, 0.0], [0.01, 0.09, 0.0], [0.0, 0.0, 0.01]], jnp.float32)
    d = D.MvNormal(cov)
    s = d.sample(key, (20000,))
    emp = np.cov(np.asarray(s).T)
    np.testing.assert_allclose(emp, cov, atol=5e-3)
    ref = stats.multivariate_normal(np.zeros(3), np.asarray(cov))
    x = np.asarray(s[:5])
    np.testing.assert_allclose(d.logpdf(x), ref.logpdf(x), rtol=1e-3, atol=1e-3)


def test_sampling_moments(key):
    ks = jax.random.split(key, 4)
    n = D.Normal(2.0, 0.5).sample(ks[0], (20000,))
    assert float(jnp.mean(n)) == pytest.approx(2.0, abs=0.02)
    assert float(jnp.std(n)) == pytest.approx(0.5, abs=0.02)
    e = D.Exponential(1.5).sample(ks[1], (20000,))
    assert float(jnp.mean(e)) == pytest.approx(1.5, abs=0.05)
    t = D.TruncatedExponential(1.0, 0.0, 1.0).sample(ks[2], (20000,))
    assert float(jnp.max(t)) <= 1.0
    g = D.Gumbel().sample(ks[3], (20000,))
    assert float(jnp.mean(g)) == pytest.approx(0.5772, abs=0.03)


def test_bijector_logjac_identity(key):
    """logjac + logp_model(x) == logp_unconstrained contract
    (parity: /root/reference/test/samples.jl:36-74)."""
    d = D.Exponential(2.0)
    bij = d.bijector
    x = d.sample(key, (100,))
    y = bij.forward(x)
    x2, logjac = bij.inverse_with_logjac(y)
    np.testing.assert_allclose(x2, x, rtol=1e-4)
    # density of transformed variable: p_y(y) = p_x(x) * |dx/dy|
    log_py = d.logpdf(x) + logjac
    # check against scipy's log-pdf of log(Exp(θ)): X=exp(Y), p_y = p_x(e^y) e^y
    expected = stats.expon.logpdf(np.asarray(x), scale=2.0) + np.asarray(y)
    np.testing.assert_allclose(log_py, expected, rtol=1e-3, atol=1e-4)
