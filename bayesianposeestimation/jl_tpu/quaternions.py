"""Quaternion algebra for pose inference, TPU-first (pure jnp, vmap-able).

Conventions
-----------
* Quaternions are stored as ``[..., 4]`` arrays in ``(w, x, y, z)`` order
  (scalar first), matching Julia's ``Quaternions.Quaternion(w, x, y, z)``.
* The tangent space is parameterized by rotation vectors ``v in R^3`` (radians),
  with the exp map ``exp(v) = (cos(|v|/2), sin(|v|/2) * v/|v|)`` so that ``v``
  is an axis-angle rotation vector.
* ``qplus`` / ``qminus`` implement the tangent-space operators that the
  reference calls ``⊕`` / ``⊖`` (KernelDistributions.jl, used via
  /root/reference/src/Samples.jl:131-141): local (right-multiplied,
  body-frame) perturbations ``q ⊕ v = q * exp(v)`` and
  ``q1 ⊖ q2 = log(q2⁻¹ * q1)``.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "qmul",
    "qconj",
    "qnorm",
    "qnormalize",
    "qexp",
    "qlog",
    "qplus",
    "qminus",
    "qrotate",
    "quat_to_matrix",
    "matrix_to_quat",
    "quat_dist",
    "quat_identity",
    "rand_quaternion",
    "quat_angle",
]


def quat_identity(shape=(), dtype=jnp.float32):
    """Identity quaternion(s) of the given batch shape."""
    q = jnp.zeros((*shape, 4), dtype=dtype)
    return q.at[..., 0].set(1.0)


def qmul(q1, q2):
    """Hamilton product of two quaternions ``[..., 4]`` (w, x, y, z)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qconj(q):
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnorm(q):
    return jnp.linalg.norm(q, axis=-1, keepdims=True)


def qnormalize(q, eps=1e-12):
    return q / jnp.maximum(qnorm(q), eps)


def qexp(v):
    """Exp map from rotation vectors ``[..., 3]`` to unit quaternions ``[..., 4]``.

    ``exp(v) = (cos(θ/2), sin(θ/2) * v/θ)`` with ``θ = |v|``.
    Numerically safe at θ -> 0 via the sinc expansion.
    """
    theta = jnp.linalg.norm(v, axis=-1, keepdims=True)
    half = 0.5 * theta
    # sin(θ/2)/θ, safe at 0: -> 1/2
    small = theta < jnp.asarray(1e-6, v.dtype)
    sinc_half = jnp.where(small, 0.5 - half * half / 12.0, jnp.sin(half) / jnp.where(small, 1.0, theta))
    w = jnp.cos(half)
    xyz = sinc_half * v
    return jnp.concatenate([w, xyz], axis=-1)


def qlog(q):
    """Log map from unit quaternions to rotation vectors ``[..., 3]``.

    Returns the shortest-arc rotation vector (handles the double cover by
    flipping quaternions with negative w).
    """
    # Shortest arc: q and -q are the same rotation
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    xyz = q[..., 1:]
    s = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    half = jnp.arctan2(s, w)  # in [0, pi/2] after the flip
    small = s < jnp.asarray(1e-6, q.dtype)
    # θ / sin(θ/2): -> 2 for θ -> 0
    scale = jnp.where(small, 2.0 + half * half / 3.0, 2.0 * half / jnp.where(small, 1.0, s))
    return scale * xyz


def qplus(q, v):
    """Tangent-space addition ``q ⊕ v = q * exp(v)`` (local perturbation).

    Parity target: KernelDistributions.jl ``⊕`` used at
    /root/reference/src/Samples.jl:131-141.
    """
    return qmul(q, qexp(v))


def qminus(q1, q2):
    """Tangent-space difference ``q1 ⊖ q2 = log(q2⁻¹ * q1)`` so that
    ``q2 ⊕ (q1 ⊖ q2) == q1`` (up to sign)."""
    return qlog(qmul(qconj(q2), q1))


def qrotate(q, p):
    """Rotate 3D points ``p [..., 3]`` by quaternion(s) ``q [..., 4]``."""
    w = q[..., :1]
    u = q[..., 1:]
    # p' = p + 2*w*(u x p) + 2*(u x (u x p))
    uxp = jnp.cross(u, p)
    return p + 2.0 * (w * uxp + jnp.cross(u, uxp))


def quat_to_matrix(q):
    """Unit quaternion ``[..., 4]`` to rotation matrix ``[..., 3, 3]``."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def matrix_to_quat(m):
    """Rotation matrix ``[..., 3, 3]`` to unit quaternion ``[..., 4]`` (w >= 0).

    Uses the numerically robust Shepperd branch selection via jnp.where.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def branch(c0, c1, c2, c3, s):
        return jnp.stack([c0, c1, c2, c3], axis=-1) / (2.0 * jnp.sqrt(jnp.maximum(s, 1e-12))[..., None])

    # four candidate solutions
    qw = branch(1 + tr, m21 - m12, m02 - m20, m10 - m01, 1 + tr)
    qx = branch(m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20, 1 + m00 - m11 - m22)
    qy = branch(m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21, 1 - m00 + m11 - m22)
    qz = branch(m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22, 1 - m00 - m11 + m22)

    cand = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22, 1 - m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(cand, axis=-1)[..., None]
    q = jnp.select(
        [idx == 0, idx == 1, idx == 2],
        [qw, qx, qy],
        qz,
    )
    q = qnormalize(q)
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_angle(q):
    """Rotation angle in radians of unit quaternion(s)."""
    return 2.0 * jnp.arccos(jnp.clip(jnp.abs(q[..., 0]), 0.0, 1.0))


def quat_dist(q1, q2):
    """Angular distance in radians between two unit quaternions.

    Parity target: /root/reference/src/Common.jl:136
    ``quat_dist(q1, q2) = acos(min(1, abs(real(q1 * conj(q2)))))``.
    """
    w = qmul(q1, qconj(q2))[..., 0]
    return jnp.arccos(jnp.minimum(1.0, jnp.abs(w)))


def rand_quaternion(key, shape=(), dtype=jnp.float32):
    """Uniform random unit quaternions (Haar measure on SO(3) via S^3)."""
    n = jax.random.normal(key, (*shape, 4), dtype=dtype)
    return qnormalize(n)
