"""Batched depth rasterization of triangle meshes — TPU-first (XLA path).

Replaces the reference's OpenGL layered-texture renderer (SciGL
``depth_offscreen_context`` / ``draw``, used via
/root/reference/src/RenderContext.jl:35-49, which rasterizes up to ``depth``
poses per draw call). Here a *batch of poses is one XLA program*:

    render_depth_batch(verts, faces, cam, t[N,3], q[N,4]) -> depth [N, H, W]

TPU-native formulation
----------------------
Edge-function rasterization is phrased as matrix multiplies so the MXU does
the heavy lifting and the VPU only evaluates masks and min-reductions:

* Vertex transform + projection: one einsum over all poses and vertices.
* For every triangle, the three edge functions and the perspective-correct
  depth numerator are *linear* in homogeneous pixel coordinates (u, v, 1).
  Stacking their coefficients gives a ``[T, 4, 3]`` tensor per chunk; one
  ``[4T, 3] @ [3, P]`` matmul evaluates all of them at every pixel.
* The triangle axis is processed in static-size chunks inside a ``lax.scan``
  carrying a running per-pixel min — memory stays at
  ``O(N * chunk * pixels)`` instead of ``O(N * F * pixels)``.

Perspective-correct depth: with signed double area ``a`` and edge functions
``w_i`` (barycentric numerators), ``1/z = (Σ w_i / z_i) / a``; the sum is a
single linear form ``d·(u,v,1)`` with ``d = Σ (1/z_i) L_i``, so
``z(p) = a / (d·p)``.

Background pixels are 0 (matching the reference convention where μ=0 marks
"no object", see the invalid-μ guards in /root/reference/src/Models.jl:129-135,187-198).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import quaternions as quat
from ..camera import CvCamera

__all__ = ["render_depth_batch", "render_depth", "project_vertices", "edge_coefficients"]


def project_vertices(verts, cam: CvCamera, t, q):
    """Transform object-space vertices by pose(s) and project.

    verts: [V, 3]; t: [..., 3]; q: [..., 4].
    Returns (uv [..., V, 2], z [..., V]) in pixel coordinates / camera depth.
    """
    # rotate+translate: R(q) @ v + t, batched over poses
    v_cam = quat.qrotate(q[..., None, :], verts) + t[..., None, :]
    x, y, z = v_cam[..., 0], v_cam[..., 1], v_cam[..., 2]
    safe_z = jnp.where(z > cam.near, z, jnp.asarray(cam.near, z.dtype))
    u = cam.f_x * x / safe_z + cam.s * y / safe_z + cam.c_x
    v = cam.f_y * y / safe_z + cam.c_y
    return jnp.stack([u, v], axis=-1), z


def edge_coefficients(tri_uv, tri_z):
    """Per-triangle linear forms for rasterization.

    tri_uv: [..., 3, 2] projected vertices, tri_z: [..., 3] camera depths.
    Returns (coefs [..., 4, 3], area [...]): rows 0-2 are the edge functions
    L_i(p) = alpha*u + beta*v + gamma (L_i(p_i) = signed double area), row 3
    is the depth numerator d = Σ (1/z_i) L_i. ``area`` is the signed double
    area of the triangle.
    """
    u0, v0 = tri_uv[..., 0, 0], tri_uv[..., 0, 1]
    u1, v1 = tri_uv[..., 1, 0], tri_uv[..., 1, 1]
    u2, v2 = tri_uv[..., 2, 0], tri_uv[..., 2, 1]

    def edge(ua, va, ub, vb):
        # w(p) = cross(b - a, p - a): alpha*u + beta*v + gamma
        alpha = -(vb - va)
        beta = ub - ua
        gamma = (vb - va) * ua - (ub - ua) * va
        return alpha, beta, gamma

    # L0 opposite vertex 0: edge (v1 -> v2); L1: (v2 -> v0); L2: (v0 -> v1)
    a0, b0, c0 = edge(u1, v1, u2, v2)
    a1, b1, c1 = edge(u2, v2, u0, v0)
    a2, b2, c2 = edge(u0, v0, u1, v1)
    area = a2 * u2 + b2 * v2 + c2  # L2(p2) = signed double area

    inv_z = 1.0 / tri_z
    d_a = inv_z[..., 0] * a0 + inv_z[..., 1] * a1 + inv_z[..., 2] * a2
    d_b = inv_z[..., 0] * b0 + inv_z[..., 1] * b1 + inv_z[..., 2] * b2
    d_c = inv_z[..., 0] * c0 + inv_z[..., 1] * c1 + inv_z[..., 2] * c2

    coefs = jnp.stack(
        [
            jnp.stack([a0, b0, c0], axis=-1),
            jnp.stack([a1, b1, c1], axis=-1),
            jnp.stack([a2, b2, c2], axis=-1),
            jnp.stack([d_a, d_b, d_c], axis=-1),
        ],
        axis=-2,
    )
    return coefs, area


def _pixel_grid(h, w, cx, cy, dtype):
    """Homogeneous pixel coordinates [3, H*W] at integer pixel centers,
    *centered on the principal point* — smaller magnitudes improve f32
    conditioning of the edge functions (OpenCV convention: u = f_x x/z + c_x
    lands on integer pixel centers)."""
    uu = jax.lax.broadcasted_iota(dtype, (h, w), 1) - jnp.asarray(cx, dtype)
    vv = jax.lax.broadcasted_iota(dtype, (h, w), 0) - jnp.asarray(cy, dtype)
    ones = jnp.ones((h, w), dtype)
    return jnp.stack([uu.ravel(), vv.ravel(), ones.ravel()], axis=0)


# Per-scan-step candidate tensor is [N, chunk, P] f32; keep it around this
# budget when auto-chunking (chunk=None). Mirrors pallas_raster._auto_chunk.
_XLA_CHUNK_BUDGET = 32 * 2**20


def _auto_chunk(n_faces, n_poses, n_pix):
    """Largest multiple-of-8 chunk whose [N, chunk, P] f32 scan-step candidate
    tensor stays in budget (>= 8, <= n_faces rounded up)."""
    by_budget = _XLA_CHUNK_BUDGET // max(1, n_poses * n_pix * 4)
    chunk = max(8, by_budget // 8 * 8)
    return min(chunk, (n_faces + 7) // 8 * 8)


@partial(jax.jit, static_argnames=("height", "width", "chunk"))
def render_depth_batch(verts, faces, cam: CvCamera, t, q, height=None, width=None, chunk=None):
    """Rasterize N poses of one mesh into [N, H, W] z-depth maps.

    verts: [V, 3] float32, faces: [F, 3] int32, t: [N, 3], q: [N, 4].
    Background = 0. Pixels with depth outside (near, far) are background.
    ``chunk=None`` auto-sizes the triangle chunk to a memory budget.
    """
    height = cam.height if height is None else height
    width = cam.width if width is None else width
    dtype = verts.dtype
    n = t.shape[0]
    n_pix = height * width
    if chunk is None:
        chunk = _auto_chunk(faces.shape[0], n, n_pix)

    uv, z = project_vertices(verts, cam, t, q)  # [N,V,2], [N,V]
    # centered coordinates (match the centered pixel grid below)
    uv = uv - jnp.asarray([cam.c_x, cam.c_y], dtype)

    f = faces.shape[0]
    pad = (-f) % chunk
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))  # padded with vertex 0 -> degenerate handled by mask
    n_chunks = (f + pad) // chunk
    face_valid = jnp.pad(jnp.ones((f,), bool), (0, pad))
    faces_c = faces_p.reshape(n_chunks, chunk, 3)
    valid_c = face_valid.reshape(n_chunks, chunk)

    grid = _pixel_grid(height, width, cam.c_x, cam.c_y, dtype)  # [3, P]
    big = jnp.asarray(jnp.inf, dtype)

    def body(carry, inputs):
        min_depth = carry  # [N, P]
        fidx, fvalid = inputs  # [chunk, 3], [chunk]
        tri_uv = uv[:, fidx, :]  # [N, chunk, 3, 2]
        tri_z = z[:, fidx]  # [N, chunk, 3]
        coefs, area = edge_coefficients(tri_uv, tri_z)  # [N,chunk,4,3], [N,chunk]

        # one MXU contraction: [N, chunk, 4, P]. Precision.HIGHEST is required:
        # the default matmul precision is bf16-class on TPU (and on this
        # build's CPU backend), which corrupts edge functions by ~1e-3 — fatal
        # for sub-pixel geometry. K=3 makes the full-precision cost negligible.
        vals = jax.lax.dot_general(
            coefs, grid, (((3,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype,
        )
        w0, w1, w2, d = vals[:, :, 0], vals[:, :, 1], vals[:, :, 2], vals[:, :, 3]

        sa = jnp.sign(area)[..., None]
        # epsilon-tolerant fill: pixels exactly on a shared edge must not be
        # dropped by BOTH adjacent triangles under f32 jitter (cracks on quad
        # diagonals); double coverage is harmless for a z-min depth buffer
        tol = 1e-5 * jnp.abs(area)[..., None]
        inside = (w0 * sa >= -tol) & (w1 * sa >= -tol) & (w2 * sa >= -tol)
        # triangle validity: non-degenerate, all vertices in front of near plane
        tri_ok = (
            (jnp.abs(area) > 1e-9)
            & jnp.all(tri_z > cam.near, axis=-1)
            & fvalid[None, :]
        )[..., None]
        depth = area[..., None] / d  # perspective-correct z
        depth_ok = (depth > cam.near) & (depth < cam.far)
        hit = inside & tri_ok & depth_ok
        cand = jnp.where(hit, depth, big)  # [N, chunk, P]
        return jnp.minimum(min_depth, jnp.min(cand, axis=1)), None

    init = jnp.full((n, n_pix), big, dtype)
    min_depth, _ = jax.lax.scan(body, init, (faces_c, valid_c))
    out = jnp.where(jnp.isfinite(min_depth), min_depth, jnp.zeros((), dtype))
    return out.reshape(n, height, width)


def render_depth(verts, faces, cam: CvCamera, t, q, height=None, width=None, chunk=None):
    """Single-pose convenience wrapper -> [H, W]."""
    out = render_depth_batch(verts, faces, cam, t[None], q[None], height, width, chunk)
    return out[0]
