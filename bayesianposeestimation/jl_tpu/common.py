"""Common utilities: pose conversion, dict/NamedTuple helpers, norms.

Parity targets: /root/reference/src/Common.jl (to_pose/to_translation/
to_rotation :59-93, norm_dims/normalize_dims :106-122, to_cpu :128-130,
quat_dist :136) and the NamedTuple ``map_intersect`` (:13-45) — here dicts of
jnp arrays play the role of Julia NamedTuples.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import quaternions as quat

__all__ = [
    "map_intersect",
    "to_pose_matrix",
    "pose_matrix",
    "norm_dims",
    "normalize_dims",
    "to_cpu",
    "quat_dist",
    "add_logdensity",
    "sum_and_dropdims",
]

quat_dist = quat.quat_dist


def map_intersect(f, a: dict, b: dict) -> dict:
    """Map ``f`` over the key intersection of two dicts; keys only in ``a``
    keep their value (parity: /root/reference/src/Common.jl:36-45)."""
    return {k: (f(v, b[k]) if k in b else v) for k, v in a.items()}


def pose_matrix(t, q):
    """Build 4x4 homogeneous pose matrices from translations ``[..., 3]`` and
    unit quaternions ``[..., 4]`` (parity: ``to_pose`` at
    /root/reference/src/Common.jl:59-63, consumed by the renderer)."""
    r = quat.quat_to_matrix(q)
    batch = jnp.broadcast_shapes(t.shape[:-1], q.shape[:-1])
    m = jnp.zeros((*batch, 4, 4), dtype=jnp.result_type(t, q))
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., :3, 3].set(jnp.broadcast_to(t, (*batch, 3)))
    m = m.at[..., 3, 3].set(1.0)
    return m


# Alias mirroring the reference's name.
to_pose_matrix = pose_matrix


def norm_dims(a, p=2, axis=0):
    """p-norm along the given axis, keeping dims
    (parity: /root/reference/src/Common.jl:106-112)."""
    return jnp.sum(jnp.abs(a) ** p, axis=axis, keepdims=True) ** (1.0 / p)


def normalize_dims(a, p=2, axis=0):
    """Normalize so the p-norm along ``axis`` is 1
    (parity: /root/reference/src/Common.jl:114-122)."""
    return a / norm_dims(a, p, axis)


def to_cpu(x):
    """Device array -> host numpy (parity: /root/reference/src/Common.jl:128-130)."""
    return jax.tree.map(np.asarray, x)


def add_logdensity(a, b):
    """Sum two log densities with broadcasting (KernelDistributions.add_logdensity)."""
    return a + b


def sum_and_dropdims(a, axes):
    """Sum over ``axes`` and drop them (KernelDistributions.sum_and_dropdims)."""
    return jnp.sum(a, axis=axes)
