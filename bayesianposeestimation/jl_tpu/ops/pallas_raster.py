"""Fused Pallas TPU kernel: rasterize + associate + score without leaving VMEM.

This is the hot op of the framework (SURVEY.md §3.5): for each pose hypothesis
1. rasterize the mesh to a depth map μ                (replaces OpenGL draw,
   /root/reference/src/RenderContext.jl:42-49)
2. analytic pixel association o(prior, μ, z)          (/root/reference/src/Models.jl:187-198)
3. per-pixel mixture logpdf against the observation z (/root/reference/src/Models.jl:99-162)
4. pixel reduction -> (ℓ[N], Σo[N])                   (BroadcastedDistribution sum)

Kernel design (TPU v5e, see /opt/skills/guides/pallas_guide.md):
* Grid over poses; the triangle axis streams through VMEM in static chunks,
  carried as a running per-pixel min — the XLA path's [N, chunk, P]
  intermediates never exist in HBM.
* Per-triangle edge functions, the perspective-correct depth numerator, AND
  the signed area are all linear forms in homogeneous pixel coordinates
  (u, v, 1) — the area via the constant form (0, 0, area). One
  [3, chunk] x [3, P] MXU contraction per linear-form group evaluates them at
  every pixel; the VPU only does inside-mask / z-min / likelihood math.
* All forms are pre-multiplied by sign(area), so the inside test is simply
  min(w0,w1,w2) >= 0 & area > 0 — no per-element sign work.
* NO runtime gathers: triangle vertices are expanded once on the host
  ([F, 3, 3]); the per-pose transform is a dense einsum (XLA gathers of
  uv[:, faces] are pathologically slow on TPU).
* Culling without sorting: triangles invalid for a pose (degenerate, behind
  the near plane, outside the viewport, backfacing) get zeroed forms, and a
  scalar-prefetched per-(pose, chunk) liveness flag lets ``@pl.when`` skip
  fully dead chunks. Mesh faces are spatially coherent in generation order,
  so backfacing/out-of-view triangles die in whole chunks (~2x typical).
* Geometry matmuls use a manual bf16x2 scheme: the principal point is
  snapped to a half-integer so pixel-grid coordinates are EXACT in bf16, and
  coefficients are split hi/lo — two default-precision MXU passes reach ~f32
  accuracy (Mosaic supports neither Precision.HIGH nor a cheap HIGHEST; a
  single bf16 pass corrupts sub-pixel geometry).
* The pixel likelihood is plain elementwise jnp (the same distribution code
  as the CPU path) traced straight into the kernel epilogue.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import quaternions as quat
from ..camera import CvCamera

__all__ = ["pallas_render_score", "pallas_render_depth", "pose_triangle_coefficients",
           "expand_triangles"]

LANE = 128


def _grid_center(width, height):
    """Static grid center (half-integers -> bf16-exact pixel coords). The true
    principal point is folded into the traced coefficients, so arbitrary
    per-image crop cameras share ONE compiled kernel per resolution."""
    return (width - 1) / 2.0, (height - 1) / 2.0


def _round_up(x, m):
    return (x + m - 1) // m * m


def expand_triangles(verts, faces, f_pad: int):
    """Once per call (NOT per pose): [F, 3, 3] object-space triangle vertices,
    zero-padded to f_pad (degenerate -> culled by the area test). A single
    [F]-row gather — the per-pose uv[:, faces] gather this replaces was the
    dominant cost of the old prepass."""
    tri = jnp.asarray(verts)[faces]  # [F, 3, 3]
    return jnp.pad(tri, ((0, f_pad - tri.shape[0]), (0, 0), (0, 0)))


def pose_triangle_coefficients(tri_verts, cam: CvCamera, t, q,
                               width: int, height: int, chunk: int,
                               backface_cull: bool = True):
    """Per-(pose, triangle) linear forms + per-chunk liveness, gather-free.

    ``tri_verts``: [f_pad, 3, 3] from :func:`expand_triangles`.
    Returns (coefs [N, 3, 5*f_pad], live [N, n_chunks] int32): 5 column
    groups — L0, L1, L2 (edge functions), d (depth numerator), and the
    constant form (0, 0, |area|) — all pre-multiplied by sign(area); culled
    triangles are zeroed.

    ``backface_cull`` assumes a consistently outward-wound closed mesh (all
    procedural meshes are; mesh_io reorients OBJ loads): back faces cannot
    win the z-min, so dropping them is exact. With the OpenCV y-down
    convention, front faces have negative screen signed area.
    """
    dtype = tri_verts.dtype
    n = t.shape[0]
    f_pad = tri_verts.shape[0]
    n_chunks = f_pad // chunk
    # static grid center: kernel pixel coords (i - gc) are EXACT in bf16
    # (half-integers < 128), so the bf16x2 hi/lo coefficient split reaches
    # ~f32 dot accuracy in two default-precision MXU passes (Mosaic supports
    # neither HIGH nor cheap HIGHEST); the (traced) principal point enters
    # through the coefficients only
    cx_snap, cy_snap = _grid_center(width, height)

    # pose transform: [N, f_pad, 3verts, 3] = R[n] @ v + t[n] — dense einsum
    rot = quat.quat_to_matrix(q)  # [N, 3, 3]
    v_cam = jnp.einsum("nij,fvj->nfvi", rot, tri_verts,
                       precision=jax.lax.Precision.HIGHEST) + t[:, None, None, :]
    x, y, z = v_cam[..., 0], v_cam[..., 1], v_cam[..., 2]
    safe_z = jnp.where(z > cam.near, z, jnp.asarray(cam.near, dtype))
    u = cam.f_x * x / safe_z + cam.s * y / safe_z + (cam.c_x - cx_snap)
    v = cam.f_y * y / safe_z + (cam.c_y - cy_snap)

    u0, u1, u2 = u[..., 0], u[..., 1], u[..., 2]
    v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]

    def edge(ua, va, ub, vb):
        return -(vb - va), ub - ua, (vb - va) * ua - (ub - ua) * va

    a0, b0, c0 = edge(u1, v1, u2, v2)
    a1, b1, c1 = edge(u2, v2, u0, v0)
    a2, b2, c2 = edge(u0, v0, u1, v1)
    area = a2 * u2 + b2 * v2 + c2

    inv_z = 1.0 / z
    d_a = inv_z[..., 0] * a0 + inv_z[..., 1] * a1 + inv_z[..., 2] * a2
    d_b = inv_z[..., 0] * b0 + inv_z[..., 1] * b1 + inv_z[..., 2] * b2
    d_c = inv_z[..., 0] * c0 + inv_z[..., 1] * c1 + inv_z[..., 2] * c2

    # viewport bbox overlap test (centered coords)
    lo_u, hi_u = -cx_snap - 0.5, width - 1 - cx_snap + 0.5
    lo_v, hi_v = -cy_snap - 0.5, height - 1 - cy_snap + 0.5
    in_view = (
        (jnp.minimum(jnp.minimum(u0, u1), u2) <= hi_u)
        & (jnp.maximum(jnp.maximum(u0, u1), u2) >= lo_u)
        & (jnp.minimum(jnp.minimum(v0, v1), v2) <= hi_v)
        & (jnp.maximum(jnp.maximum(v0, v1), v2) >= lo_v)
    )
    # near AND far vertex culling: interpolated depth is then bounded by the
    # vertex depths, so the kernel needs no per-pixel near/far checks
    valid = (
        (jnp.abs(area) > 1e-9)
        & jnp.all((z > cam.near) & (z < cam.far), axis=-1)
        & in_view
    )
    if backface_cull:
        valid = valid & (area < 0)

    sign = jnp.where(valid, jnp.sign(area), 0.0)
    live = jnp.any(valid.reshape(n, n_chunks, chunk), axis=-1).astype(jnp.int32)

    # stack forms [N, 5, 3, f_pad] (sign-premultiplied), then -> [N, 3, 5*f_pad]
    forms = jnp.stack(
        [
            jnp.stack([a0, b0, c0], axis=1),
            jnp.stack([a1, b1, c1], axis=1),
            jnp.stack([a2, b2, c2], axis=1),
            jnp.stack([d_a, d_b, d_c], axis=1),
        ],
        axis=1,
    )  # [N, 4, 3, f_pad]
    forms = forms * sign[:, None, None, :]
    zero = jnp.zeros_like(area)
    area_row = jnp.stack([zero, zero, jnp.abs(area) * jnp.abs(sign)], axis=1)  # [N,3,Fp]
    forms = jnp.concatenate([forms, area_row[:, None, :, :]], axis=1)  # [N,5,3,Fp]
    coefs = jnp.transpose(forms, (0, 2, 1, 3)).reshape(n, 3, 5 * f_pad)
    # bf16x2 split: hi + lo reconstructs coefs to ~2^-16 relative; validated
    # against an f64 golden rasterizer at <=1.3e-5 absolute depth error.
    # CRITICAL: the split must be computed by mantissa masking, NOT as
    # coefs - f32(bf16(coefs)) — XLA's excess-precision simplification can
    # fold the convert round-trip and silently zero `lo` (observed: the same
    # code produced lo==0 when jitted standalone). The masked hi is exactly
    # bf16-representable, and the subtraction has no convert pair to elide.
    bits = jax.lax.bitcast_convert_type(coefs, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000), jnp.float32)
    hi = hi_f32.astype(jnp.bfloat16)
    lo = (coefs - hi_f32).astype(jnp.bfloat16)
    return hi, lo, live


def _interpret_mode() -> bool:
    """Pallas interpret mode off-TPU (CPU tests)."""
    return jax.default_backend() not in ("tpu", "axon")


def _make_kernel(width, height, p_pad, f_pad, chunk, near, far, n_pix_valid,
                 score_fn=None, with_mu=False):
    """Kernel body; args: scalar-prefetched [N, n_chunks] liveness, then the
    bf16 hi/lo coefficient splits. ``score_fn(mu, z, prior_o) -> (ell_px, o)``
    elementwise; None -> render. near/far are static floats."""
    n_chunks = f_pad // chunk
    big = float("inf")
    gc_x, gc_y = _grid_center(width, height)

    def grid_rows():
        # half-integer coords relative to the static grid center are EXACT in
        # bf16 for |coord| < 128 -> the hi/lo dots lose nothing
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, p_pad), 1)
        u = jnp.where(idx < n_pix_valid, idx % width, -1).astype(jnp.float32)
        v = jnp.where(idx < n_pix_valid, idx // width, -1).astype(jnp.float32)
        u = u - gc_x
        v = v - gc_y
        ones = jnp.ones((1, p_pad), jnp.float32)
        return jnp.concatenate([u, v, ones], axis=0).astype(jnp.bfloat16)

    def raster(live_ref, hi_ref, lo_ref, mind_ref):
        grid = grid_rows()
        mind_ref[:] = jnp.full((1, p_pad), big, jnp.float32)
        i = pl.program_id(0)

        for c in range(n_chunks):

            @pl.when(live_ref[i, c] > 0)
            def _():
                def group(g):
                    sl = pl.ds(g * f_pad + c * chunk, chunk)

                    def dot(ref):
                        return jax.lax.dot_general(
                            ref[0, :, sl], grid, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # [chunk, p_pad]

                    return dot(hi_ref) + dot(lo_ref)

                w0, w1, w2, d, areav = (group(g) for g in range(5))
                # epsilon-tolerant fill (see rasterize.py): avoids cracks on
                # shared edges under f32 jitter. No per-pixel near/far test:
                # culling rejected any triangle with a vertex outside
                # (near, far), and perspective-correct depth is bounded by
                # the vertex depths.
                inside = (jnp.minimum(jnp.minimum(w0, w1), w2) >= -1e-5 * areav) & (
                    areav > 0
                )
                # approx reciprocal: 2^-12 relative depth error (validated
                # p99 2.4e-5 vs the exact divide on TPU), ~5% faster; the
                # interpret-mode emulation is coarser, so CPU tests divide
                if _interpret_mode():
                    depth = areav / d
                else:
                    depth = areav * pl.reciprocal(d, approx=True)
                cand = jnp.where(inside, depth, big)
                chunk_min = jnp.min(cand, axis=0, keepdims=True)  # [1, p_pad]
                mind_ref[:] = jnp.minimum(mind_ref[:], chunk_min)

        mind = mind_ref[:]
        return jnp.where(jnp.isfinite(mind), mind, 0.0)

    if score_fn is None:

        def render_kernel(live_ref, hi_ref, lo_ref, mu_ref, mind_ref):
            mu_ref[0] = raster(live_ref, hi_ref, lo_ref, mind_ref)

        return render_kernel

    def score_kernel(live_ref, hi_ref, lo_ref, z_ref, prior_ref, ell_ref,
                     sumo_ref, mind_ref, *maybe_mu):
        mu = raster(live_ref, hi_ref, lo_ref, mind_ref)
        z = z_ref[:]
        prior_o = prior_ref[:]
        ell_px, o = score_fn(mu, z, prior_o)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, p_pad), 1)
        pixmask = idx < n_pix_valid
        ell_ref[0] = jnp.sum(jnp.where(pixmask, ell_px, 0.0)).reshape(1, 1)
        sumo_ref[0] = jnp.sum(jnp.where(pixmask, o, 0.0)).reshape(1, 1)
        if with_mu:
            maybe_mu[0][0] = mu

    return score_kernel


def _prep(verts, faces, cam, t, q, width, height, chunk, backface_cull):
    f_pad = _round_up(faces.shape[0], chunk)
    tri_verts = expand_triangles(verts, faces, f_pad)
    hi, lo, live = pose_triangle_coefficients(
        tri_verts, cam, t, q, width, height, chunk, backface_cull)
    return hi, lo, live, f_pad


@partial(jax.jit, static_argnames=("height", "width", "chunk", "backface_cull"))
def pallas_render_depth(verts, faces, cam: CvCamera, t, q,
                        height=None, width=None, chunk=256, backface_cull=True):
    """Drop-in Pallas replacement for rasterize.render_depth_batch:
    [N] poses -> [N, H, W] z-depth maps (0 = background)."""
    height = cam.height if height is None else height
    width = cam.width if width is None else width
    n = t.shape[0]
    n_pix = height * width
    p_pad = _round_up(n_pix, LANE)

    hi, lo, live, f_pad = _prep(verts, faces, cam, t, q, width, height,
                                chunk, backface_cull)
    kernel = _make_kernel(width, height, p_pad, f_pad, chunk,
                          float(cam.near), float(cam.far), n_pix)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, 5 * f_pad), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 3, 5 * f_pad), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, p_pad), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((1, p_pad), jnp.float32)],
    )
    mu = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 1, p_pad), jnp.float32),
        interpret=_interpret_mode(),
    )(live, hi, lo)
    return mu[:, 0, :n_pix].reshape(n, height, width)


def _flatten_pad_image(img, p_pad):
    flat = img.reshape(-1)
    return jnp.pad(flat, (0, p_pad - flat.shape[0]))[None, :]


@partial(jax.jit, static_argnames=("height", "width", "chunk", "score_fn",
                                   "return_mu", "backface_cull"))
def pallas_render_score(verts, faces, cam: CvCamera, t, q, z_img, prior_o,
                        score_fn, height=None, width=None, chunk=256,
                        return_mu=False, backface_cull=True):
    """Fused render + associate + score.

    ``score_fn(mu, z, prior_o) -> (ell_px, o)``: elementwise per-pixel log
    density and association probability (static — compiled into the kernel).
    ``z_img`` [H, W] observation (invalid = +inf), ``prior_o`` scalar or [H, W].

    Returns (ell [N], sum_o [N]) and optionally μ [N, H, W].
    """
    height = cam.height if height is None else height
    width = cam.width if width is None else width
    n = t.shape[0]
    n_pix = height * width
    p_pad = _round_up(n_pix, LANE)

    hi, lo, live, f_pad = _prep(verts, faces, cam, t, q, width, height,
                                chunk, backface_cull)
    z_row = _flatten_pad_image(z_img.astype(jnp.float32), p_pad)
    prior_row = _flatten_pad_image(
        jnp.broadcast_to(jnp.asarray(prior_o, jnp.float32), (height, width)), p_pad
    )

    kernel = _make_kernel(width, height, p_pad, f_pad, chunk,
                          float(cam.near), float(cam.far), n_pix,
                          score_fn=score_fn, with_mu=return_mu)

    out_shape = [
        jax.ShapeDtypeStruct((n, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((n, 1, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0)),
    ]
    if return_mu:
        out_shape.append(jax.ShapeDtypeStruct((n, 1, p_pad), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, p_pad), lambda i, *_: (i, 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, 5 * f_pad), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 3, 5 * f_pad), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p_pad), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, p_pad), lambda i, *_: (0, 0)),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((1, p_pad), jnp.float32)],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=_interpret_mode(),
    )(live, hi, lo, z_row, prior_row)

    ell = outs[0][:, 0, 0]
    sumo = outs[1][:, 0, 0]
    if return_mu:
        return ell, sumo, outs[2][:, 0, :n_pix].reshape(n, height, width)
    return ell, sumo
