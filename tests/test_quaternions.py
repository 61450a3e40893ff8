"""Quaternion algebra tests (parity model: /root/reference/test/samples.jl ⊕/⊖)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianposeestimation.jl_tpu import quaternions as q


def test_identity_and_mul(key):
    qi = q.quat_identity()
    r = q.rand_quaternion(key, (5,))
    np.testing.assert_allclose(q.qmul(qi, r), r, atol=1e-6)
    np.testing.assert_allclose(q.qmul(r, qi[None]), r, atol=1e-6)


def test_mul_conj_is_identity(key):
    r = q.rand_quaternion(key, (7,))
    prod = q.qmul(r, q.qconj(r))
    np.testing.assert_allclose(prod[..., 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(prod[..., 1:], 0.0, atol=1e-5)


def test_exp_log_roundtrip(key):
    v = 0.5 * jax.random.normal(key, (10, 3))
    np.testing.assert_allclose(q.qlog(q.qexp(v)), v, atol=1e-5)


def test_exp_log_small_angle():
    v = jnp.array([[1e-8, 0.0, 0.0], [0.0, 0.0, 0.0]])
    out = q.qlog(q.qexp(v))
    np.testing.assert_allclose(out, v, atol=1e-7)


def test_plus_minus_inverse(key):
    """q2 ⊕ (q1 ⊖ q2) == q1 — the tangent-space contract the samplers rely on
    (/root/reference/src/Samples.jl:131-141)."""
    k1, k2 = jax.random.split(key)
    q1 = q.rand_quaternion(k1, (6,))
    q2 = q.rand_quaternion(k2, (6,))
    recovered = q.qplus(q2, q.qminus(q1, q2))
    # quaternion double cover: compare rotations
    np.testing.assert_allclose(q.quat_dist(recovered, q1), 0.0, atol=1e-3)


def test_rotation_matrix_consistency(key):
    r = q.rand_quaternion(key, (4,))
    p = jax.random.normal(jax.random.PRNGKey(0), (4, 3))
    via_mat = jnp.einsum("nij,nj->ni", q.quat_to_matrix(r), p)
    via_quat = q.qrotate(r, p)
    np.testing.assert_allclose(via_mat, via_quat, atol=1e-5)


def test_matrix_quat_roundtrip(key):
    r = q.rand_quaternion(key, (16,))
    m = q.quat_to_matrix(r)
    r2 = q.matrix_to_quat(m)
    np.testing.assert_allclose(q.quat_dist(r, r2), 0.0, atol=1e-3)


def test_quat_dist():
    qi = q.quat_identity()
    # 90 degrees about x; the reference's quat_dist (Common.jl:136) returns
    # acos(|w|) = θ/2, i.e. HALF the rotation angle — we match that formula.
    qx = q.qexp(jnp.array([jnp.pi / 2, 0.0, 0.0]))
    assert q.quat_dist(qi, qx) == pytest.approx(jnp.pi / 4, abs=1e-5)
    # same rotation, opposite sign quaternion (arccos near 1 is
    # ill-conditioned in f32: error ~ sqrt(eps) ~ 3e-4)
    assert q.quat_dist(qx, -qx) == pytest.approx(0.0, abs=1e-3)


def test_rand_quaternion_uniformity(key):
    r = q.rand_quaternion(key, (20000,))
    np.testing.assert_allclose(jnp.linalg.norm(r, axis=-1), 1.0, atol=1e-5)
    # mean of each component should vanish
    assert jnp.max(jnp.abs(jnp.mean(r, axis=0))) < 0.02
