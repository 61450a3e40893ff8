"""Fully-fused Pallas TPU kernel: transform + rasterize + associate + score.

This is the hot op of the framework (SURVEY.md §3.5): for each pose hypothesis
1. transform + project the mesh and build per-triangle linear forms (VPU)
2. rasterize to a depth map μ                          (replaces OpenGL draw,
   /root/reference/src/RenderContext.jl:42-49)
3. analytic pixel association o(prior, μ, z)           (/root/reference/src/Models.jl:187-198)
4. per-pixel mixture logpdf against the observation z  (/root/reference/src/Models.jl:99-162)
5. pixel reduction -> (ℓ[N], Σo[N])                    (BroadcastedDistribution sum)

ALL stages run inside one kernel: the only HBM inputs are the (broadcast)
triangle vertices, an [N, 8] pose array, an 8-float camera row, and the
observation; nothing pose-sized ever round-trips through HBM. (An earlier
design precomputed per-(pose, triangle) coefficients in XLA — the swarm of
small XLA ops cost more than the rasterization itself.)

Kernel design (TPU v5e, see /opt/skills/guides/pallas_guide.md):
* Grid over POSE_BLOCK=8-pose blocks. Per program: rotate + project the
  [f_pad] triangle-vertex rows for all 8 poses at once ([8, f_pad] arrays,
  pose scalars as [8, 1] columns — full VPU sublane utilization) and build
  the per-triangle linear forms in homogeneous pixel coordinates (u, v, 1)
  — two edge functions, pre-multiplied by sign(area) so the inside test is
  branch-free. Only the raster dot + inside-test epilogue loop per pose.
* Every form is pre-divided by the signed area: the inside test becomes
  ``min(w0', w1') >= -1e-5 and w0'+w1' <= 1+1e-5``. The THIRD edge function
  never rides the MXU contraction (barycentric edge numerators sum to the
  double area identically, so w2' = 1 - w0' - w1'); the perspective-correct
  1/depth value rides it only at SMALL pixel counts (``depth_in_dot``,
  where the VPU epilogue is the bound and an extra M-row group is nearly
  free) — at large crops it is instead reconstructed in the epilogue as the
  barycentric combination d = Σ iz_i w_i' = gamma + alpha*W0 + beta*W1 from
  per-TRIANGLE scalars (broadcast as [chunk, 1] columns via one plane
  transpose per program), so the dot output — the measured MXU-streaming
  bound there — carries HALF the M rows of the naive 4-form layout. The
  per-pixel z-min is a running MAX over d with a single exact divide per
  pixel after the chunk loop — no per-(triangle, pixel) reciprocal, and the
  constant area form disappears.
* The forms live in [8, f_pad] VMEM coefficient planes (pose = sublane);
  the triangle axis streams through in static chunks of ``chunk``: per
  (pose, chunk) ONE [6, n_dot*chunk] x [6, P] MXU contraction evaluates all
  dot groups (concatenated along the M axis) at every pixel.
* Geometry matmuls use a manual bf16x2 scheme: the pixel grid is centered on
  a static half-integer point (EXACT in bf16; the true principal point is
  folded into the traced coefficients) and each [3, chunk] slice is split
  hi/lo by mantissa masking. The lo correction rides the SAME contraction:
  the MXU pads K=3 anyway, so rows 3-5 hold the lo coefficients against a
  duplicated grid — ~f32 accuracy at the cost of ONE default-precision pass
  (Mosaic supports neither Precision.HIGH nor a cheap HIGHEST, and a single
  bf16 pass corrupts sub-pixel geometry).
* Culling: triangles that are degenerate, outside (near, far), outside the
  viewport, or backfacing (consistently wound closed meshes; mesh_io
  reorients OBJ loads) get zeroed forms. Culling near/far whole triangles
  also makes per-pixel depth-range tests unnecessary (perspective-correct
  depth is bounded by vertex depths).
* Sparse raster work: faces are pre-sorted by chunk-aligned recursive
  orthogonal bisection (``spatial_sort_faces``) so each triangle chunk is a
  compact surface patch; per-(pose, chunk) liveness flags in SMEM let
  ``@pl.when`` skip chunks whose patch is fully backfacing/off-screen for
  that pose. Optionally (``band_cull=True``) the pixel row also splits into
  lane-aligned bands with per-(pose, chunk, band) v-extent flags — a large
  win when objects cover few pixel rows (wide-frame tracking, lost
  particles), but a net LOSS for crop cameras where the object fills the
  frame (each extra band costs an MXU pipeline drain, ~0.2 us, and no band
  dies), hence off by default.
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

__all__ = ["pallas_render_score", "pallas_render_depth", "expand_triangle_rows",
           "spatial_sort_faces"]

LANE = 128
# Coefficient plane groups: two edge-function forms L0/area, L1/area (3
# coefficients each) plus a third depth group — either the 1/depth form's
# d_a/d_b/d_c coefficients (depth_in_dot) or the per-triangle
# depth-combination scalars alpha/beta/gamma — 9 [PB, f_pad] planes total.
N_FORMS = 3
# The third edge function NEVER rides the raster dot (barycentric edge
# numerators sum to the double area identically, so after pre-division by
# the signed area w2' = 1 - w0' - w1'). The 1/depth value has TWO layouts:
#   depth_in_dot=True   d rides the dot as a third M-row group (3-group dot)
#   depth_in_dot=False  d is reconstructed in the epilogue from per-triangle
#                       scalars: d = gamma + alpha*W0 + beta*W1 (2-group dot,
#                       ~4 extra VPU ops per (triangle, pixel))
# Measured crossover on v5e (r5 inference_time + crop50 decision matrix):
# at small crops the epilogue's VPU ops are the bound and an extra MXU row
# group is nearly free — reconstruction cost ~1.6x e2e at 25 px
# (314k -> 195k hyp/s, 250 particles); at 50 px the MXU/VMEM streaming of
# the [rows, pixels] dot output is the bound and the 2-group layout wins
# (89.4k -> 103.9k hyp/s) — it also frees enough of the chunk VMEM budget
# to reach the winning single-chunk config. Auto policy: depth rides the
# dot up to this padded pixel count (30x30 flagship = 1024 lanes included).
_DEPTH_IN_DOT_MAX_PPAD = 1024


def _resolve_depth_in_dot(depth_in_dot, p_pad):
    if depth_in_dot is None:
        return p_pad <= _DEPTH_IN_DOT_MAX_PPAD
    return bool(depth_in_dot)


# Grid-centered half-integer pixel coordinates are bf16-exact only while
# |coord| <= 127.5 (bf16 has 8 significand bits: ulp grows to 1.0 at 128), so
# the kernel supports renders up to 256 px per side. The lo-pass corrects
# coefficient rounding, NOT grid rounding — larger renders must use the XLA
# path (ops.rasterize), whose f32 HIGHEST-precision grid has no such limit.
MAX_KERNEL_SIDE = 256


def _grid_center(width, height):
    """Static grid center (half-integers -> bf16-exact pixel coords up to
    MAX_KERNEL_SIDE). The true principal point is folded into the traced
    coefficients, so arbitrary per-image crop cameras share ONE compiled
    kernel per resolution."""
    return (width - 1) / 2.0, (height - 1) / 2.0


# Branch-free inside test: the edge groups are pre-scaled by 2^30 (a power
# of two — exact, the bf16x2 split mantissas are untouched) with the
# barycentric tolerance folded into the c coefficients, so the raster dot
# emits W_i = SCALE*(w_i + TOL). A pixel is inside iff min(w0, w1, w2) >=
# -TOL, i.e. min(W0, W1, W2) >= 0 — and since every inside pixel has
# W_i >= SCALE*TOL (~1.1e4) while 1/depth <= 1/near (100 at the default
# near plane), the covered-depth candidate collapses to pure arithmetic:
#     cand = min(W0, W1, SCALE*(1+3*TOL) - (W0+W1), d)
# which equals d for inside pixels (all W dominate d) and is <= 0 for
# outside/culled ones (some W < 0, or d = 0 for culled) — no compares, no
# selects, ~2 fewer VPU ops per (triangle, pixel) pair in the hot epilogue.
# The only semantic shift vs an explicit compare is a barycentric sliver of
# width d/SCALE ~ 1e-9 at the -TOL boundary where cand lands in (0, d).
_INSIDE_SCALE = 2.0 ** 30
_INSIDE_TOL = 1e-5
_INSIDE_C = _INSIDE_SCALE * (1.0 + 3.0 * _INSIDE_TOL)


def _check_resolution(width, height):
    if width > MAX_KERNEL_SIDE or height > MAX_KERNEL_SIDE:
        raise ValueError(
            f"pallas raster kernel supports at most {MAX_KERNEL_SIDE}px per "
            f"side (bf16-exact pixel grid), got {width}x{height}; use "
            "ops.rasterize.render_depth_batch for larger renders")


def _round_up(x, m):
    return (x + m - 1) // m * m


# Per-chunk dot output is [n_dot*chunk, p_pad] f32 (n_dot = 3 or 2 per the
# depth_in_dot policy); keep it around this budget. Measured on v5e: at
# p_pad=1024 chunk 640-1280 (10-21 MiB) is fastest, at p_pad=3712 chunk 256
# (14 MiB) beats 512 (29 MiB); the r5 50x50 decision matrix
# (data/exp_pro/kernel_profile/crop50_decision_matrix_r5.log) showed the
# single-chunk config beating the budget-constrained auto choice 7.99 vs
# 9.06 us/pose at the 3-group dot — with the 2-group dot the same
# single-chunk config fits the budget.
_CHUNK_VMEM_BUDGET = 16 * 2**20


def resolve_chunk(n_faces, n_pix, chunk=None, depth_in_dot=None):
    """The triangle-chunk size a render at ``n_pix`` pixels will use: the
    explicit ``chunk`` or the VMEM-budget auto choice. Exposed so callers can
    pre-sort faces chunk-aligned (see spatial_sort_faces)."""
    if chunk is not None:
        return chunk
    return _auto_chunk(n_faces, _round_up(n_pix, LANE), depth_in_dot)


def _auto_chunk(n_faces, p_pad, depth_in_dot=None):
    """Chunk choice: multiple of LANE, dot output within the VMEM budget, and
    minimal TOTAL padded rows n_chunks*chunk (a chunk that barely exceeds a
    divisor of the face count can otherwise waste up to ~2x dot work — e.g.
    1280 faces at chunk 1024 pads to 2048). Ties go to the LARGER chunk:
    measured on v5e, each extra chunk costs ~0.4 us/pose of split/concat/dot
    setup — far more than finer-grained liveness culling saves."""
    n_dot = 3 if _resolve_depth_in_dot(depth_in_dot, p_pad) else 2
    by_budget = _CHUNK_VMEM_BUDGET // (n_dot * 4 * p_pad)
    cmax = max(LANE, by_budget // LANE * LANE)
    f_ceil = _round_up(n_faces, LANE)
    best_c = LANE
    best_total = None
    for c in range(LANE, min(cmax, f_ceil) + LANE, LANE):
        total = _round_up(n_faces, c)
        if best_total is None or total < best_total or (
                total == best_total and c > best_c):
            best_total, best_c = total, c
    return best_c


def spatial_sort_faces(verts, faces, chunk: int = 64):
    """Reorder faces by chunk-aligned recursive orthogonal bisection of their
    centroids: split the face stream along its widest axis into two halves
    whose sizes are multiples of ``chunk``, recurse until every group is one
    chunk, and emit groups in traversal order.

    Every ``chunk`` of the resulting triangle stream is then EXACTLY one
    bisection leaf — a compact surface patch — so for ANY rigid pose it
    projects to a small image region, and backfacing patches of closed
    meshes turn whole chunks dead: the kernel's per-(chunk, band) liveness
    tests skip most of the dense raster work. All split sizes are static
    (python recursion over static slices), so this is pure XLA
    (constant-folded for constant meshes; hoisted out of sampler scans for
    traced ones)."""
    verts = jnp.asarray(verts)
    faces = jnp.asarray(faces)
    n_f = faces.shape[0]
    if n_f <= chunk:
        return faces
    f_pad = _round_up(n_f, chunk)
    cent = verts[faces].mean(axis=1)
    # pad rows sort to +inf: they sink to the tail of every right split, so
    # the traversal ends [real faces..., pads] and perm[:n_f] is all real
    cent_p = jnp.concatenate(
        [cent, jnp.full((f_pad - n_f, 3), jnp.inf, cent.dtype)], axis=0)

    def rec(idx):
        m = idx.shape[0]
        if m <= chunk:
            return [idx]
        c = cent_p[idx]  # [m, 3]
        finite = jnp.isfinite(c[:, 0])[:, None]
        span = (jnp.max(jnp.where(finite, c, -jnp.inf), axis=0)
                - jnp.min(jnp.where(finite, c, jnp.inf), axis=0))
        ax = jnp.argmax(span)
        key = jnp.where(finite[:, 0], jnp.take_along_axis(
            c, jnp.broadcast_to(ax[None, None], (m, 1)), axis=1)[:, 0], jnp.inf)
        idx = idx[jnp.argsort(key)]
        k = (m // chunk + 1) // 2 * chunk
        return rec(idx[:k]) + rec(idx[k:])

    perm = jnp.concatenate(rec(jnp.arange(f_pad)))
    return faces[perm[:n_f]]


def antipodal_pair_faces(verts, faces, lane: int = None):
    """Reorder + pad ``faces`` for the PAIRED raster path: an int32
    [2*f_half, 3] array where slots j and j + f_half hold faces with
    near-opposite normals (greedy antipodal matching), padded with degenerate
    [0, 0, 0] rows (zero area -> culled).

    f_half is lane-aligned, which guarantees the render wrapper's A-chunk
    auto-choice (minimal padded total) is a divisor of f_half — the
    multi-chunk paired path needs no tail handling at any resolution.

    For a closed backface-culled mesh, at most one face of an antipodal pair
    is front-facing except in a thin silhouette band, so the kernel can
    per-pose SELECT the live face of each pair into a half-size raster
    region (plus a small compacted overflow for both-live pairs) — the
    "fewer (triangle, pixel) pairs" algorithmic step the dense path's
    measured VMEM-traffic ceiling calls for. Measured on the 1280-face bench
    blob: both-live pairs mean 42 / p95 79 / max 93 of 640 over 300 random
    poses (one 128-slot overflow region covers ~every pose).

    Requires concrete (non-traced) inputs; correctness never depends on the
    pairing quality — badly paired or open meshes only shift work into the
    overflow regions."""
    import numpy as np

    lane = LANE if lane is None else lane
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    n_f = faces.shape[0]
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
    # deterministic sweep order; each unmatched face grabs the most-opposite
    # remaining normal (O(n^2) vectorized — preprocessing, tiny meshes)
    order = np.argsort(n @ np.array([1.0, 0.577, 0.21]))
    alive = np.ones(n_f, bool)
    left, right = [], []
    for i in order:
        if not alive[i]:
            continue
        alive[i] = False
        rest = np.nonzero(alive)[0]
        if rest.size == 0:
            left.append(i)
            right.append(-1)
            break
        j = int(rest[np.argmin(n[rest] @ n[i])])
        alive[j] = False
        left.append(i)
        right.append(j)
    f_half = _round_up(max(len(left), 1), lane)
    out = np.zeros((2 * f_half, 3), np.int32)
    out[: len(left)] = faces[left]
    rr = np.asarray(right, np.int64)  # explicit dtype: [] is float64
    keep = rr >= 0
    out[f_half : f_half + len(right)][keep] = faces[rr[keep]]
    return jnp.asarray(out)


# Overflow region width for the paired path: one 128-lane tile. Regions are
# @pl.when-gated on the per-pose both-live count, so extra regions only cost
# when silhouette overflow actually reaches them.
_PAIR_OVERFLOW = LANE


# Static cap on the number of @pl.when raster regions (n_chunks * n_bands):
# finer bands cull more dead pixels but each region carries branch + dot
# setup overhead, and Mosaic fully unrolls the region loops at compile time.
_MAX_REGIONS = 64


def _band_slices(p_pad, n_chunks):
    """Split the padded pixel row into bands (lane-aligned static slices).
    Bands grow from one 128-lane tile until n_chunks * n_bands fits the
    region cap."""
    bp = LANE
    while bp < p_pad and n_chunks * ((p_pad + bp - 1) // bp) > _MAX_REGIONS:
        bp *= 2
    return [(s, min(s + bp, p_pad)) for s in range(0, p_pad, bp)]


def _band_v_ranges(bands, width, height, n_pix_valid, gc_y):
    """Per band: inclusive grid-centered v-range of its valid pixel rows,
    with half-pixel slack (conservative for the 1e-5 edge tolerance)."""
    out = []
    for bs, be in bands:
        rlo = bs // width
        rhi = min((min(be, n_pix_valid) - 1) // width, height - 1)
        out.append((rlo - gc_y - 0.5, rhi - gc_y + 0.5))
    return out


def expand_triangle_rows(verts, faces, f_pad: int):
    """[9, f_pad] triangle-vertex rows (row 3j+k = coordinate k of vertex j),
    zero-padded (degenerate -> culled by the area test). One [F]-row gather,
    once per call — never per pose."""
    tri = jnp.asarray(verts)[faces]  # [F, 3, 3]
    rows = tri.reshape(tri.shape[0], 9).T  # [9, F]
    return jnp.pad(rows, ((0, 0), (0, f_pad - tri.shape[0])))


def _camera_row(cam: CvCamera, width, height):
    """Traced camera scalars for the kernel: fx, fy, s, cx_off, cy_off, pad."""
    gc_x, gc_y = _grid_center(width, height)
    return jnp.stack([
        jnp.float32(cam.f_x), jnp.float32(cam.f_y), jnp.float32(cam.s),
        jnp.float32(cam.c_x) - gc_x, jnp.float32(cam.c_y) - gc_y,
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
    ])[None, :]


# Poses per Pallas program: form building, liveness tests, and the score
# epilogue vectorize across poses on the 8 VPU sublanes (one pose per
# sublane); the per-pose raster regions share one program's prologue.
POSE_BLOCK = 8


def _pose_rows(t, q):
    """[G, POSE_BLOCK, 8] pose scalars: tx ty tz qw qx qy qz pad. The pose
    batch is padded with behind-camera sentinels (tz = -1 -> every triangle
    fails the near test -> empty render) so G = ceil(N / POSE_BLOCK)."""
    n = t.shape[0]
    n_pad = _round_up(max(n, 1), POSE_BLOCK)
    rows = jnp.concatenate(
        [t.astype(jnp.float32), q.astype(jnp.float32),
         jnp.zeros((n, 1), jnp.float32)], axis=1)
    pad = jnp.tile(jnp.array([[0.0, 0.0, -1.0, 1.0, 0.0, 0.0, 0.0, 0.0]],
                             jnp.float32), (n_pad - n, 1))
    return jnp.concatenate([rows, pad], axis=0).reshape(-1, POSE_BLOCK, 8)


def _interpret_mode() -> bool:
    """Pallas interpret mode off-TPU (CPU tests)."""
    return jax.default_backend() not in ("tpu", "axon")


def _bf16_split(x):
    """Fold-proof hi/lo split: hi has the low 16 mantissa bits zeroed (exactly
    bf16-representable), lo = x - hi. Never compute this as
    x - f32(bf16(x)) — XLA's excess-precision pass folds it to zero."""
    bits = pltpu.bitcast(x, jnp.uint32) if not _interpret_mode() else (
        jax.lax.bitcast_convert_type(x, jnp.uint32))
    hi_f32 = (
        pltpu.bitcast(bits & jnp.uint32(0xFFFF0000), jnp.float32)
        if not _interpret_mode()
        else jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000), jnp.float32)
    )
    return hi_f32.astype(jnp.bfloat16), (x - hi_f32).astype(jnp.bfloat16)


# Triangle compaction (dense path): for a closed backface-culled mesh only
# ~half the triangles survive culling per pose, but the dense raster pays the
# VPU-bound inside-test/z-max epilogue for ALL of them — the measured
# bottleneck at the flagship config (~4.5 of 5.7 us/pose). Compaction packs
# the live triangles to the front so only ceil(live / cap) regions of cap
# triangles run:
#   1. validity per triangle is recovered from the zeroed forms (culled
#      triangles have all-zero edge coefficients);
#   2. a lane-axis Hillis-Steele prefix sum assigns each live triangle its
#      compacted slot; dead triangles get slot -1 (matched by no region);
#   3. per (pose, region) a one-hot matrix S[s, j] = (slot[j] == s) permutes
#      the 18 hi/lo coefficient rows through ONE bf16 MXU contraction —
#      exact, because each output row has a single 0/1-weighted term and
#      accumulation is f32. The MXU is idle during the epilogue anyway, so
#      the permutation is nearly free in wall time;
#   4. regions whose slot range lies beyond the live count are skipped via
#      @pl.when — for typical poses the second of two regions never runs,
#      halving the raster dot and epilogue.
# The per-(triangle, pixel) math is identical to the uncompacted path (a
# permutation of independent rows under an order-invariant max); results
# agree to reduction-order float noise (the raster dot's K=6 accumulation
# can associate differently for the different M extent).
def _compact_cap(f_pad):
    """Slots per region. Backface+view culling kills ~half the triangles in
    EXPECTATION, but per-pose live counts reach ~57% on bumpy closed meshes
    (measured 526-731 of 1280 on the flagship blob) — a cap of f_pad/2 sends
    a third of poses into the second region, paying full epilogue plus the
    compaction overhead. 0.6*f_pad covers ~all poses with one region."""
    return _round_up(int(0.6 * f_pad), LANE)


def _make_kernel(width, height, p_pad, f_pad, chunk, near, far, n_pix_valid,
                 backface_cull, score_fn=None, with_mu=False, band_cull=True,
                 compact=False, paired=False, with_hyper=False,
                 depth_in_dot=False):
    """Kernel body. Refs: cam (SMEM [1,8]), pose (VMEM [1, POSE_BLOCK, 8]),
    tri (VMEM [9,f_pad]) [, z (VMEM [1,p_pad]), prior (VMEM [1,p_pad])],
    outputs, then scratch: 9 coefficient planes (VMEM [POSE_BLOCK, f_pad],
    pose = sublane), band/chunk liveness (SMEM), maxd (VMEM
    [POSE_BLOCK, p_pad]).

    One program handles POSE_BLOCK poses: the transform/projection/form math
    runs on [POSE_BLOCK, f_pad] arrays (pose scalars as [PB, 1] columns
    broadcast against [1, f_pad] triangle rows — full sublane utilization,
    ~8x the VPU throughput of one-pose rows), and the score epilogue reduces
    [POSE_BLOCK, p_pad] at once. Only the raster dot + inside-test epilogue
    loop per pose (their work is inherently per (pose, triangle, pixel)).
    Coefficient stores are full [PB, f_pad] blocks (aligned); the per-pose
    raster reads single-sublane [1, chunk] slices back.
    """
    n_chunks = f_pad // chunk
    n_dot = 3 if depth_in_dot else 2
    PB = POSE_BLOCK
    if 1.0 / near >= 0.5 * _INSIDE_SCALE * _INSIDE_TOL:
        # the branch-free inside test needs every inside pixel's scaled edge
        # values (>= SCALE*TOL) to dominate the inverse depth (<= 1/near)
        raise ValueError(
            f"near plane {near} too small for the branch-free inside test "
            f"(requires 1/near < {0.5 * _INSIDE_SCALE * _INSIDE_TOL:.0f})")
    gc_x, gc_y = _grid_center(width, height)
    bands = _band_slices(p_pad, n_chunks) if band_cull else [(0, p_pad)]
    n_bands = len(bands)
    band_v = _band_v_ranges(bands, width, height, n_pix_valid, gc_y)
    # dense-path phases: lane-aligned halves of the pixel row, software-
    # pipelined so the MXU (next dot) overlaps the VPU (previous epilogue)
    if p_pad >= 2 * LANE:
        half = _round_up(p_pad // 2, LANE)
        dense_phases = [(0, half), (half, p_pad)]
    else:
        dense_phases = [(0, p_pad)]

    def grid_rows():
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, p_pad), 1)
        u = jnp.where(idx < n_pix_valid, idx % width, -1).astype(jnp.float32) - gc_x
        v = jnp.where(idx < n_pix_valid, idx // width, -1).astype(jnp.float32) - gc_y
        ones = jnp.ones((1, p_pad), jnp.float32)
        one_grid = jnp.concatenate([u, v, ones], axis=0).astype(jnp.bfloat16)
        # duplicated grid: rows 0-2 hit the hi coefficients, rows 3-5 the lo
        return jnp.concatenate([one_grid, one_grid], axis=0)  # [6, p_pad]

    def lane_prefix_sum(run, width):
        """Hillis-Steele along lanes with static shifted concats (portable
        to interpret mode, no circular-roll masking)."""
        d = 1
        while d < width:
            shifted = jnp.concatenate(
                [jnp.zeros((PB, d), jnp.float32), run[:, : width - d]],
                axis=1)
            run = run + shifted
            d *= 2
        return run

    def split_lhs(form_refs, p, sl):
        """[6, n_dot*m] raster LHS for lane slice ``sl``: hi rows 0-2 / lo
        rows 3-5 (bf16x2 mantissa split), the dot groups along lanes."""
        his, los = [], []
        for g in range(n_dot):
            rows = jnp.concatenate(
                [form_refs[3 * g + k][p:p + 1, sl] for k in range(3)], axis=0)
            hi, lo = _bf16_split(rows)
            his.append(hi)
            los.append(lo)
        return jnp.concatenate(
            [jnp.concatenate(his, axis=1),
             jnp.concatenate(los, axis=1)], axis=0)

    def split_bigs(form_refs, p, sl):
        """Per dot group: [6, w] bf16 rows (hi a,b,c over lo a,b,c) — kept
        as separate values so every permutation-dot result sits at
        sublane offset 0 (Mosaic cannot lane-concat slices taken at
        different sublane offsets of one larger vreg)."""
        bigs = []
        for g in range(n_dot):
            rows = jnp.concatenate(
                [form_refs[3 * g + k][p:p + 1, sl] for k in range(3)], axis=0)
            hi, lo = _bf16_split(rows)
            bigs.append(jnp.concatenate([hi, lo], axis=0))
        return bigs

    def depth_combo_T(form_refs, sl):
        """[w, PB] transposed alpha/beta/gamma planes for lane slice ``sl``:
        the epilogue broadcasts them as per-TRIANGLE [m, 1] columns, which
        needs the triangle axis on sublanes. One [PB, w] -> [w, PB]
        transpose per plane per program (8 poses amortized)."""
        return [jnp.transpose(form_refs[6 + k][:, sl]) for k in range(3)]

    def permute_combo(combo_T, sel, p):
        """Compacted [m, 1] alpha/beta/gamma columns for pose ``p``: the
        same exact one-hot permutation as permute_lhs, via hi/lo bf16
        splits of the transposed planes (a plain f32/bf16 dot would round
        gamma — the dominant 1/depth term — to bf16)."""
        out = []
        for ct in combo_T:
            hi, lo = _bf16_split(ct[:, p:p + 1])
            col = (jax.lax.dot_general(
                sel, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    sel, lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            out.append(col)
        return out

    def permute_lhs(bigs, sel):
        """Compact live rows via an exact one-hot MXU permutation: one 0/1
        bf16 term per output row, f32 accumulation; hi/lo rows are
        bf16-representable so the cast back is lossless."""
        comps = [
            jax.lax.dot_general(
                big_g, sel, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            for big_g in bigs]
        return jnp.concatenate(comps, axis=1)

    def make_epilogue(maxd_ref, p, m, combo=None):
        """Branch-free inside-test + running z-numerator max over a dot
        output of ``m`` triangle rows per dot group (see _INSIDE_SCALE).
        With ``combo`` = (alpha, beta, gamma) [m, 1] per-triangle columns,
        the 1/depth value is reconstructed as d = gamma + alpha*W0 + beta*W1
        (2-group dot); with combo=None it rides the dot as the third M-row
        group (depth_in_dot)."""
        if combo is None:
            assert depth_in_dot

        def epilogue(out, bs, be):
            w0 = out[0 * m:1 * m]
            w1 = out[1 * m:2 * m]
            w2 = _INSIDE_C - (w0 + w1)
            if combo is None:
                dd = out[2 * m:3 * m]
            else:
                alpha, beta, gamma = combo
                dd = gamma + alpha * w0 + beta * w1
            cand = jnp.minimum(jnp.minimum(jnp.minimum(w0, w1), w2), dd)
            maxd_ref[p:p + 1, bs:be] = jnp.maximum(
                maxd_ref[p:p + 1, bs:be],
                jnp.max(cand, axis=0, keepdims=True))
        return epilogue

    def pipelined_dense(lhs, grid, epilogue):
        """Dense-phase dots, software-pipelined: issue the NEXT phase's MXU
        contraction before the previous phase's VPU epilogue so the
        scheduler can overlap the units."""
        pend = None
        for bs, be in dense_phases:
            out = jax.lax.dot_general(
                lhs, grid[:, bs:be], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if pend is not None:
                epilogue(*pend)
            pend = (out, bs, be)
        epilogue(*pend)

    def build_forms(cam_ref, pose_ref, tri_ref, form_refs, band_live_ref,
                    chunk_live_ref):
        """Transform + project + linear forms for POSE_BLOCK poses at once:
        every array below is [PB, f_pad] (pose = sublane)."""
        fx, fy, sk = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
        cx_off, cy_off = cam_ref[0, 3], cam_ref[0, 4]
        pose = pose_ref[0]  # [PB, 8]
        tx, ty, tz = pose[:, 0:1], pose[:, 1:2], pose[:, 2:3]
        qw, qx, qy, qz = pose[:, 3:4], pose[:, 4:5], pose[:, 5:6], pose[:, 6:7]
        # rotation matrix scalars from the quaternion
        r00 = 1 - 2 * (qy * qy + qz * qz)
        r01 = 2 * (qx * qy - qw * qz)
        r02 = 2 * (qx * qz + qw * qy)
        r10 = 2 * (qx * qy + qw * qz)
        r11 = 1 - 2 * (qx * qx + qz * qz)
        r12 = 2 * (qy * qz - qw * qx)
        r20 = 2 * (qx * qz - qw * qy)
        r21 = 2 * (qy * qz + qw * qx)
        r22 = 1 - 2 * (qx * qx + qy * qy)

        u = [None] * 3
        v = [None] * 3
        z = [None] * 3
        for j in range(3):
            vx = tri_ref[3 * j : 3 * j + 1, :]
            vy = tri_ref[3 * j + 1 : 3 * j + 2, :]
            vz = tri_ref[3 * j + 2 : 3 * j + 3, :]
            x = r00 * vx + r01 * vy + r02 * vz + tx
            y = r10 * vx + r11 * vy + r12 * vz + ty
            zz = r20 * vx + r21 * vy + r22 * vz + tz
            inv = 1.0 / jnp.where(zz > near, zz, near)
            u[j] = (fx * x + sk * y) * inv + cx_off
            v[j] = fy * y * inv + cy_off
            z[j] = zz

        def edge(ua, va, ub, vb):
            return -(vb - va), ub - ua, (vb - va) * ua - (ub - ua) * va

        a0, b0, c0 = edge(u[1], v[1], u[2], v[2])
        a1, b1, c1 = edge(u[2], v[2], u[0], v[0])
        a2, b2, c2 = edge(u[0], v[0], u[1], v[1])
        area = a2 * u[2] + b2 * v[2] + c2

        iz0 = 1.0 / z[0]
        iz1 = 1.0 / z[1]
        iz2 = 1.0 / z[2]

        # u, v are already in grid-centered coordinates (cx_off folded in)
        lo_u, hi_u = -gc_x - 0.5, width - 1 - gc_x + 0.5
        lo_v, hi_v = -gc_y - 0.5, height - 1 - gc_y + 0.5
        in_view = (
            (jnp.minimum(jnp.minimum(u[0], u[1]), u[2]) <= hi_u)
            & (jnp.maximum(jnp.maximum(u[0], u[1]), u[2]) >= lo_u)
            & (jnp.minimum(jnp.minimum(v[0], v[1]), v[2]) <= hi_v)
            & (jnp.maximum(jnp.maximum(v[0], v[1]), v[2]) >= lo_v)
        )
        z_ok = ((z[0] > near) & (z[0] < far) & (z[1] > near) & (z[1] < far)
                & (z[2] > near) & (z[2] < far))
        valid = (jnp.abs(area) > 1e-9) & z_ok & in_view
        if backface_cull:
            valid = valid & (area < 0)
        # Pre-divide every form by the signed area (= sign/|area|): the inside
        # test gets a constant rhs and the d group becomes 1/depth; culled
        # triangles get zero forms (inside-true but d' = 0, lost to the max).
        factor = jnp.where(valid, 1.0 / jnp.where(valid, area, 1.0), 0.0)

        # w2' is derived at raster time (w2' = 1 - w0' - w1'). The edge
        # groups carry the _INSIDE_SCALE/_INSIDE_TOL folding (see the
        # constants above) so the epilogue is branch-free. The 1/depth value
        # takes one of two layouts (see _DEPTH_IN_DOT_MAX_PPAD):
        # depth_in_dot stores the d-form coefficients d_a/d_b/d_c in planes
        # 6-8 and the dot emits d' = 1/depth rows directly; otherwise planes
        # 6-8 hold per-TRIANGLE scalars and the epilogue reconstructs
        #   d = gamma + alpha*W0 + beta*W1
        # from the barycentric identity d = sum_i iz_i * w_i' with
        # w_i' = W_i/SCALE - TOL (scalars broadcast as [chunk, 1] columns
        # after a transpose). Either way culled triangles have factor=0 ->
        # W0=W1=SCALE*TOL > 0 (inside-test passes vacuously) but d=0, so
        # they lose to the background max.
        fK = factor * _INSIDE_SCALE
        if depth_in_dot:
            d_a = iz0 * a0 + iz1 * a1 + iz2 * a2
            d_b = iz0 * b0 + iz1 * b1 + iz2 * b2
            d_c = iz0 * c0 + iz1 * c1 + iz2 * c2
            depth_planes = [d_a * factor, d_b * factor, d_c * factor]
        else:
            validm = valid.astype(jnp.float32)
            alpha = validm * (iz0 - iz2) * (1.0 / _INSIDE_SCALE)
            beta = validm * (iz1 - iz2) * (1.0 / _INSIDE_SCALE)
            gamma = validm * (iz2 - _INSIDE_TOL * (iz0 + iz1 - 2.0 * iz2))
            depth_planes = [alpha, beta, gamma]
        coeffs = [a0 * fK, b0 * fK,
                  (c0 * factor + _INSIDE_TOL) * _INSIDE_SCALE,
                  a1 * fK, b1 * fK,
                  (c1 * factor + _INSIDE_TOL) * _INSIDE_SCALE,
                  *depth_planes]
        for k, val in enumerate(coeffs):
            form_refs[k][:] = val  # full [PB, f_pad] aligned store

        # per-(pose, chunk, band) liveness scalars into SMEM (static slices):
        # a chunk is live for a band iff some valid triangle's v-extent
        # intersects the band's pixel-row range. With bisection-sorted faces
        # (spatial_sort_faces) chunks are compact patches, so most flags die.
        validf = valid.astype(jnp.float32)
        if band_cull:
            # per-triangle v-extents, widened by the inside test's 1e-5
            # BARYCENTRIC tolerance scaled to pixels (1e-5 of the extent):
            # a near-plane-grazing triangle can project thousands of pixels
            # tall, where the tolerance region outgrows the half-pixel slack
            # baked into band_v.
            vmin = jnp.minimum(jnp.minimum(v[0], v[1]), v[2])
            vmax = jnp.maximum(jnp.maximum(v[0], v[1]), v[2])
            tol = _INSIDE_TOL * (vmax - vmin)
            vmin = vmin - tol
            vmax = vmax + tol
        for c in range(n_chunks):
            cs = slice(c * chunk, (c + 1) * chunk)
            if band_cull:
                for b, (v_lo, v_hi) in enumerate(band_v):
                    hit = validf[:, cs] * (
                        (vmin[:, cs] <= v_hi) & (vmax[:, cs] >= v_lo))  # [PB, chunk]
                    for p in range(PB):
                        band_live_ref[(p * n_chunks + c) * n_bands + b] = jnp.max(
                            hit[p:p + 1, :]).astype(jnp.int32)
            for p in range(PB):
                chunk_live_ref[p * n_chunks + c] = jnp.max(
                    validf[p:p + 1, cs]).astype(jnp.int32)

    cap = _compact_cap(f_pad)
    n_regions = -(-f_pad // cap)

    def raster_compact(cam_ref, pose_ref, tri_ref, form_refs, band_live_ref,
                       chunk_live_ref, live_ref, maxd_ref):
        build_forms(cam_ref, pose_ref, tri_ref, form_refs, band_live_ref,
                    chunk_live_ref)
        grid = grid_rows()
        maxd_ref[:] = jnp.zeros((PB, p_pad), jnp.float32)

        # validity from the zeroed forms: a culled triangle has factor 0 ->
        # zero a/b edge coefficients (the c rows carry the folded SCALE*TOL
        # offset even when culled, so they are excluded); a live triangle has
        # a nonzero edge-0 normal (exact zero would mean two vertices
        # project identically -> zero area -> culled)
        validf = ((jnp.abs(form_refs[0][:]) + jnp.abs(form_refs[1][:]))
                  > 0).astype(jnp.float32)
        run = lane_prefix_sum(validf, f_pad)
        slot = jnp.where(validf > 0, run - 1.0, -1.0)  # [PB, f_pad]
        for p in range(PB):
            live_ref[p] = jnp.max(run[p:p + 1, f_pad - 1:f_pad]).astype(jnp.int32)

        s_base = jax.lax.broadcasted_iota(jnp.int32, (cap, f_pad), 0).astype(
            jnp.float32)  # [cap, f_pad]: slot index per output row
        combo_T = (None if depth_in_dot
                   else depth_combo_T(form_refs, slice(None)))  # 3x [f_pad, PB]

        for p in range(PB):
            bigs = split_bigs(form_refs, p, slice(None))  # n_dot x [6, f_pad]
            slot_row = slot[p:p + 1, :]  # [1, f_pad]

            for r in range(n_regions):

                @pl.when(live_ref[p] > r * cap)
                def _(r=r):
                    sel = (s_base + (r * cap) == slot_row).astype(jnp.bfloat16)
                    epilogue = make_epilogue(
                        maxd_ref, p, cap,
                        None if depth_in_dot
                        else permute_combo(combo_T, sel, p))
                    # [6, n_dot*cap]: hi rows 0-2 / lo rows 3-5, groups along lanes
                    pipelined_dense(permute_lhs(bigs, sel), grid, epilogue)

        maxd = maxd_ref[:]
        return jnp.where(maxd > 0, 1.0 / jnp.where(maxd > 0, maxd, 1.0), 0.0)

    # ---- paired path: antipodal pair selection + silhouette overflow ----
    # The dense path's measured floor is the (triangle, pixel) pairs the
    # raster dot materializes (stripping the whole epilogue to a bare max
    # leaves 5.50 us/pose unchanged at the flagship config). With
    # antipodal_pair_faces preprocessing, at most one face of each pair is
    # front-facing outside a thin silhouette band, so per pose we SELECT the
    # live face of every pair into a half-size always-run region A (9 VPU
    # selects on [PB, f_half] planes — the VPU is idle during the dots), and
    # compact the rare both-live R faces into @pl.when-gated overflow regions
    # of _PAIR_OVERFLOW slots via the same one-hot MXU permutation as the
    # compact path (cheap here: the one-hot is [128, f_half], ~6x smaller).
    # Worst case (open mesh, no culling) every pair overflows and the cost
    # degenerates to ~the dense path; typical closed meshes run
    # (f_half + 128) / f_pad ~ 60% of the dense pairs.
    #
    # Region A is itself chunked (chunk | f_half, enforced by
    # _resolve_paired) so the path works past the single-chunk VMEM budget —
    # e.g. 50x50 renders where the dot output caps chunks at 512 faces. Each
    # A-chunk is gated on the union of its L/R liveness flags from
    # build_forms (conservative: selection only drops faces).
    f_half = f_pad // 2
    n_over = max(f_half // _PAIR_OVERFLOW, 1)
    n_chunks_a = f_half // chunk if paired else 1

    def raster_paired(cam_ref, pose_ref, tri_ref, form_refs, band_live_ref,
                      chunk_live_ref, live_ref, maxd_ref):
        build_forms(cam_ref, pose_ref, tri_ref, form_refs, band_live_ref,
                    chunk_live_ref)
        grid = grid_rows()
        maxd_ref[:] = jnp.zeros((PB, p_pad), jnp.float32)

        # pair validity from the zeroed a/b edge coefficients (the folded-
        # tolerance c rows are nonzero even when culled)
        validf = ((jnp.abs(form_refs[0][:]) + jnp.abs(form_refs[1][:]))
                  > 0).astype(jnp.float32)
        vl = validf[:, :f_half]
        vr = validf[:, f_half:]
        both = vl * vr  # silhouette pairs: the R face spills to overflow

        # overflow slot per R face
        run = lane_prefix_sum(both, f_half)
        slot = jnp.where(both > 0, run - 1.0, -1.0)  # [PB, f_half]
        for p in range(PB):
            live_ref[p] = jnp.max(
                run[p:p + 1, f_half - 1:f_half]).astype(jnp.int32)

        # region A: select the live face of each pair into the L half of
        # every coefficient plane, in place (R halves stay intact for the
        # overflow permutation below). Selecting f32 planes is exact.
        vsel = vl > 0
        for k in range(3 * N_FORMS):
            plane = form_refs[k][:]
            form_refs[k][:, :f_half] = jnp.where(
                vsel, plane[:, :f_half], plane[:, f_half:])

        s_base = jax.lax.broadcasted_iota(
            jnp.int32, (_PAIR_OVERFLOW, f_half), 0).astype(jnp.float32)
        # transposed depth-combo planes: selected-A halves and R halves
        combo_T_a = (None if depth_in_dot
                     else depth_combo_T(form_refs, slice(0, f_half)))
        combo_T_r = (None if depth_in_dot
                     else depth_combo_T(form_refs, slice(f_half, None)))

        for p in range(PB):
            # ---- region A: the selected pair faces, chunked; each chunk
            # is gated on (L-chunk live | R-chunk live) computed by
            # build_forms over the pair layout. The single-chunk case runs
            # ungated: a @pl.when around the region costs ~20% e2e at the
            # flagship config (measured 185k -> 149k hyp/s — the branch
            # fences the dot/epilogue pipeline), and a whole-mesh A region
            # is live for any on-screen pose anyway. ----
            def region_a(ca, p=p):
                combo_a = (None if depth_in_dot
                           else [ct[ca * chunk:(ca + 1) * chunk, p:p + 1]
                                 for ct in combo_T_a])
                epilogue_a = make_epilogue(maxd_ref, p, chunk, combo_a)
                lhs = split_lhs(form_refs, p, pl.ds(ca * chunk, chunk))
                pipelined_dense(lhs, grid, epilogue_a)

            for ca in range(n_chunks_a):
                if n_chunks_a == 1:
                    region_a(ca)
                else:

                    @pl.when(chunk_live_ref[p * n_chunks + ca]
                             + chunk_live_ref[p * n_chunks + n_chunks_a + ca]
                             > 0)
                    def _(ca=ca):
                        region_a(ca)

            # ---- overflow regions: compacted both-live R faces ----
            bigs = split_bigs(form_refs, p, slice(f_half, None))  # n_dot x [6, f_half]
            slot_row = slot[p:p + 1, :]

            for r in range(n_over):

                @pl.when(live_ref[p] > r * _PAIR_OVERFLOW)
                def _(r=r):
                    sel = (s_base + (r * _PAIR_OVERFLOW) == slot_row).astype(
                        jnp.bfloat16)
                    epilogue_o = make_epilogue(
                        maxd_ref, p, _PAIR_OVERFLOW,
                        None if depth_in_dot
                        else permute_combo(combo_T_r, sel, p))
                    pipelined_dense(permute_lhs(bigs, sel), grid, epilogue_o)

        maxd = maxd_ref[:]
        return jnp.where(maxd > 0, 1.0 / jnp.where(maxd > 0, maxd, 1.0), 0.0)

    def raster(cam_ref, pose_ref, tri_ref, form_refs, band_live_ref,
               chunk_live_ref, maxd_ref):
        build_forms(cam_ref, pose_ref, tri_ref, form_refs, band_live_ref,
                    chunk_live_ref)
        grid = grid_rows()
        maxd_ref[:] = jnp.zeros((PB, p_pad), jnp.float32)
        combo_T = (None if depth_in_dot
                   else depth_combo_T(form_refs, slice(None)))  # 3x [f_pad, PB]

        for p in range(PB):
            for c in range(n_chunks):

                @pl.when(chunk_live_ref[p * n_chunks + c] > 0)
                def _():
                    combo = (None if depth_in_dot
                             else [ct[c * chunk:(c + 1) * chunk, p:p + 1]
                                   for ct in combo_T])
                    epilogue = make_epilogue(maxd_ref, p, chunk, combo)
                    # [6, n_dot*chunk]: groups along M, lo correction along K
                    # (the MXU pads K=3 anyway — the lo pass is free)
                    lhs = split_lhs(form_refs, p, pl.ds(c * chunk, chunk))

                    if band_cull:
                        for b, (bs, be) in enumerate(bands):

                            @pl.when(band_live_ref[
                                (p * n_chunks + c) * n_bands + b] > 0)
                            def _(bs=bs, be=be):
                                out = jax.lax.dot_general(
                                    lhs, grid[:, bs:be],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                                epilogue(out, bs, be)
                    else:
                        pipelined_dense(lhs, grid, epilogue)

        maxd = maxd_ref[:]
        return jnp.where(maxd > 0, 1.0 / jnp.where(maxd > 0, maxd, 1.0), 0.0)

    n_form_scratch = 3 * N_FORMS

    def run_raster(cam_ref, pose_ref, tri_ref, scratch):
        form_refs = scratch[:n_form_scratch]
        band_live_ref = scratch[n_form_scratch]
        chunk_live_ref = scratch[n_form_scratch + 1]
        maxd_ref = scratch[n_form_scratch + 2]
        if paired:
            live_ref = scratch[n_form_scratch + 3]
            return raster_paired(cam_ref, pose_ref, tri_ref, form_refs,
                                 band_live_ref, chunk_live_ref, live_ref,
                                 maxd_ref)
        if compact:
            live_ref = scratch[n_form_scratch + 3]
            return raster_compact(cam_ref, pose_ref, tri_ref, form_refs,
                                  band_live_ref, chunk_live_ref, live_ref,
                                  maxd_ref)
        return raster(cam_ref, pose_ref, tri_ref, form_refs, band_live_ref,
                      chunk_live_ref, maxd_ref)

    if score_fn is None:

        def render_kernel(cam_ref, pose_ref, tri_ref, mu_ref, *scratch):
            mu_ref[0] = run_raster(cam_ref, pose_ref, tri_ref, scratch)

        return render_kernel

    def score_kernel(cam_ref, pose_ref, tri_ref, z_ref, prior_ref, *rest):
        if with_hyper:
            hyper_ref = rest[0]
            rest = rest[1:]
        ell_ref, sumo_ref = rest[0], rest[1]
        rest = rest[2:]
        if with_mu:
            mu_ref = rest[0]
            scratch = rest[1:]
        else:
            scratch = rest
        mu = run_raster(cam_ref, pose_ref, tri_ref, scratch)  # [PB, p_pad]
        z = z_ref[:]
        prior_o = prior_ref[:]
        if with_hyper:
            # traced likelihood scalars (SMEM row): score_fn takes a 4th arg
            hyper = tuple(hyper_ref[0, i] for i in range(8))
            ell_px, o = score_fn(mu, z, prior_o, hyper)
        else:
            ell_px, o = score_fn(mu, z, prior_o)  # broadcast [PB, p_pad]
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, p_pad), 1)
        pixmask = idx < n_pix_valid
        ell_ref[0] = jnp.sum(jnp.where(pixmask, ell_px, 0.0), axis=1,
                             keepdims=True)  # [PB, 1]
        sumo_ref[0] = jnp.sum(jnp.where(pixmask, jnp.broadcast_to(
            o, ell_px.shape), 0.0), axis=1, keepdims=True)
        if with_mu:
            mu_ref[0] = mu

    return score_kernel


def _scratch_shapes(f_pad, n_chunks, p_pad, band_cull=True, compact=False,
                    paired=False):
    n_bands = len(_band_slices(p_pad, n_chunks)) if band_cull else 1
    shapes = (
        [pltpu.VMEM((POSE_BLOCK, f_pad), jnp.float32)
         for _ in range(3 * N_FORMS)]
        + [pltpu.SMEM((POSE_BLOCK * n_chunks * n_bands,), jnp.int32),
           pltpu.SMEM((POSE_BLOCK * n_chunks,), jnp.int32),
           pltpu.VMEM((POSE_BLOCK, p_pad), jnp.float32)]
    )
    if compact or paired:
        shapes.append(pltpu.SMEM((POSE_BLOCK,), jnp.int32))
    return shapes


def _resolve_compact(compact, band_cull):
    """Auto policy: OFF. Measured on v5e at the flagship config (1280 faces,
    30x30, 200-vs-2000-repeat scanned slopes): dense 5.50 us/pose,
    compact 6.83 us/pose at cap=0.6*f_pad (7.15 at n=100), and the e2e bench
    regressed 144.6k -> 119.3k hyp/s at the original cap=f_pad/2. The one-hot
    build ([cap, f_pad] compares, ~1M VPU element-ops/pose) plus the
    permutation dots cost more than the ~40% epilogue rows they remove; the
    savings the analysis predicted assumed the epilogue was the ONLY
    per-pair cost, but out-materialization traffic scales with pairs too and
    is already partially hidden behind the MXU. Kept as an explicit opt-in
    for meshes/configs where the live fraction is far below 0.6."""
    if compact is None:
        return False
    if compact and band_cull:
        raise ValueError("compact raster is exclusive with band_cull")
    return bool(compact)


def _resolve_paired(paired, band_cull, compact, n_chunks, f_pad, n_faces,
                    chunk):
    """The paired path needs antipodal_pair_faces layout (faces length
    2*f_half, lane-aligned halves, A-chunk dividing the half, unrolled
    regions within the cap) and is exclusive with band culling /
    compaction."""
    if not paired:
        return False
    if band_cull or compact:
        raise ValueError("paired raster is exclusive with band_cull/compact")
    f_half = f_pad // 2
    if (f_pad != n_faces or f_pad % (2 * LANE) != 0
            or f_half % chunk != 0):
        raise ValueError(
            "paired raster requires antipodal_pair_faces preprocessing: "
            f"faces length {n_faces} must equal f_pad {f_pad}, have "
            f"{LANE}-aligned halves, and chunk {chunk} must divide the "
            f"half {f_half}")
    regions = f_half // chunk + max(f_half // _PAIR_OVERFLOW, 1)
    if regions > _MAX_REGIONS:
        # Mosaic fully unrolls the region loops; a huge paired mesh would
        # blow up compile time/code size the dense path avoids via its
        # region cap. Mirror that cap here rather than compiling anyway.
        raise ValueError(
            f"paired raster would unroll {regions} regions "
            f"(> {_MAX_REGIONS}); use the dense/spatial-sort path for "
            f"meshes this large")
    return True


def _paired_chunk(n_pair, p_pad, depth_in_dot=None):
    """A-chunk size for a paired layout of ``n_pair`` slots: the dense
    auto-chunk of the HALF (always a divisor of the lane-aligned half)."""
    return _auto_chunk(n_pair // 2, p_pad, depth_in_dot)


def paired_layout_ok(n_faces, n_pix, chunk=None):
    """True when a mesh of ``n_faces`` can take the paired raster path at
    ``n_pix`` pixels: the unrolled region count (A-chunks + silhouette
    overflow regions) must stay within the kernel's region cap. With an
    explicit ``chunk``, it must additionally divide the lane-aligned
    half."""
    f_half = _round_up(max((n_faces + 1) // 2, 1), LANE)
    if chunk is None:
        chunk = _paired_chunk(2 * f_half, _round_up(n_pix, LANE))
    elif f_half % chunk != 0:
        return False
    regions = f_half // chunk + max(f_half // _PAIR_OVERFLOW, 1)
    return regions <= _MAX_REGIONS


@partial(jax.jit, static_argnames=("height", "width", "chunk", "backface_cull",
                                   "band_cull", "compact", "paired",
                                   "depth_in_dot"))
def pallas_render_depth(verts, faces, cam: CvCamera, t, q,
                        height=None, width=None, chunk=None, backface_cull=True,
                        band_cull=False, compact=None, paired=False,
                        depth_in_dot=None):
    """Drop-in Pallas replacement for rasterize.render_depth_batch:
    [N] poses -> [N, H, W] z-depth maps (0 = background).

    For best performance pre-sort ``faces`` with
    ``spatial_sort_faces(verts, faces, resolve_chunk(...))`` ONCE per mesh
    (FusedPosterior does) — chunk-aligned surface patches let the
    per-(chunk, band) liveness culling skip most dead raster regions.
    Correctness does not depend on the order."""
    height = cam.height if height is None else height
    width = cam.width if width is None else width
    _check_resolution(width, height)
    n = t.shape[0]
    n_pix = height * width
    p_pad = _round_up(n_pix, LANE)
    depth_in_dot = _resolve_depth_in_dot(depth_in_dot, p_pad)
    if chunk is None:
        chunk = (_paired_chunk(faces.shape[0], p_pad, depth_in_dot) if paired
                 else _auto_chunk(faces.shape[0], p_pad, depth_in_dot))
    f_pad = _round_up(faces.shape[0], chunk)
    n_chunks = f_pad // chunk

    compact = _resolve_compact(compact, band_cull)
    paired = _resolve_paired(paired, band_cull, compact, n_chunks, f_pad,
                             faces.shape[0], chunk)
    tri_rows = expand_triangle_rows(verts, faces, f_pad)
    kernel = _make_kernel(width, height, p_pad, f_pad, chunk,
                          float(cam.near), float(cam.far), n_pix, backface_cull,
                          band_cull=band_cull, compact=compact, paired=paired,
                          depth_in_dot=depth_in_dot)

    pose_rows = _pose_rows(t, q)
    n_prog = pose_rows.shape[0]
    mu = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, POSE_BLOCK, 8), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, f_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, POSE_BLOCK, p_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_prog, POSE_BLOCK, p_pad), jnp.float32),
        scratch_shapes=_scratch_shapes(f_pad, n_chunks, p_pad, band_cull,
                                       compact, paired),
        interpret=_interpret_mode(),
    )(_camera_row(cam, width, height), pose_rows, tri_rows)
    return mu.reshape(-1, p_pad)[:n, :n_pix].reshape(n, height, width)


def _flatten_pad_image(img, p_pad):
    flat = img.reshape(-1)
    return jnp.pad(flat, (0, p_pad - flat.shape[0]))[None, :]


@partial(jax.jit, static_argnames=("height", "width", "chunk", "score_fn",
                                   "return_mu", "backface_cull", "band_cull",
                                   "compact", "paired", "depth_in_dot"))
def pallas_render_score(verts, faces, cam: CvCamera, t, q, z_img, prior_o,
                        score_fn, height=None, width=None, chunk=None,
                        return_mu=False, backface_cull=True, band_cull=False,
                        compact=None, paired=False, hyper=None,
                        depth_in_dot=None):
    """Fully-fused transform + render + associate + score.

    ``score_fn(mu, z, prior_o) -> (ell_px, o)``: elementwise per-pixel log
    density and association probability (static — compiled into the kernel).
    ``z_img`` [H, W] observation (invalid = +inf), ``prior_o`` scalar or [H, W].

    ``hyper``: optional [<=8] array of TRACED likelihood scalars (e.g. tuned
    pixel_sigma/association_sigma for hyperparameter search); when given the
    kernel receives it as an SMEM row and calls
    ``score_fn(mu, z, prior_o, hyper_tuple)`` — hyperparameter sweeps then
    share ONE compiled kernel instead of re-compiling per candidate.

    Returns (ell [N], sum_o [N]) and optionally μ [N, H, W].
    """
    height = cam.height if height is None else height
    width = cam.width if width is None else width
    _check_resolution(width, height)
    n = t.shape[0]
    n_pix = height * width
    p_pad = _round_up(n_pix, LANE)
    depth_in_dot = _resolve_depth_in_dot(depth_in_dot, p_pad)
    if chunk is None:
        chunk = (_paired_chunk(faces.shape[0], p_pad, depth_in_dot) if paired
                 else _auto_chunk(faces.shape[0], p_pad, depth_in_dot))
    f_pad = _round_up(faces.shape[0], chunk)
    n_chunks = f_pad // chunk

    compact = _resolve_compact(compact, band_cull)
    paired = _resolve_paired(paired, band_cull, compact, n_chunks, f_pad,
                             faces.shape[0], chunk)
    tri_rows = expand_triangle_rows(verts, faces, f_pad)
    z_row = _flatten_pad_image(z_img.astype(jnp.float32), p_pad)
    prior_row = _flatten_pad_image(
        jnp.broadcast_to(jnp.asarray(prior_o, jnp.float32), (height, width)), p_pad
    )
    kernel = _make_kernel(width, height, p_pad, f_pad, chunk,
                          float(cam.near), float(cam.far), n_pix, backface_cull,
                          score_fn=score_fn, with_mu=return_mu,
                          band_cull=band_cull, compact=compact, paired=paired,
                          with_hyper=hyper is not None,
                          depth_in_dot=depth_in_dot)

    pose_rows = _pose_rows(t, q)
    n_prog = pose_rows.shape[0]
    out_shape = [
        jax.ShapeDtypeStruct((n_prog, POSE_BLOCK, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_prog, POSE_BLOCK, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, POSE_BLOCK, 1), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, POSE_BLOCK, 1), lambda i: (i, 0, 0)),
    ]
    if return_mu:
        out_shape.append(
            jax.ShapeDtypeStruct((n_prog, POSE_BLOCK, p_pad), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, POSE_BLOCK, p_pad), lambda i: (i, 0, 0)))

    in_specs = [
        pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, POSE_BLOCK, 8), lambda i: (i, 0, 0)),
        pl.BlockSpec((9, f_pad), lambda i: (0, 0)),
        pl.BlockSpec((1, p_pad), lambda i: (0, 0)),
        pl.BlockSpec((1, p_pad), lambda i: (0, 0)),
    ]
    operands = [_camera_row(cam, width, height), pose_rows, tri_rows, z_row,
                prior_row]
    if hyper is not None:
        hyper_row = jnp.zeros((1, 8), jnp.float32).at[0, : jnp.asarray(
            hyper).shape[0]].set(jnp.asarray(hyper, jnp.float32))
        in_specs.append(
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM))
        operands.append(hyper_row)

    outs = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=_scratch_shapes(f_pad, n_chunks, p_pad, band_cull,
                                       compact, paired),
        interpret=_interpret_mode(),
    )(*operands)

    ell = outs[0].reshape(-1)[:n]
    sumo = outs[1].reshape(-1)[:n]
    if return_mu:
        mu = outs[2].reshape(-1, p_pad)[:n, :n_pix].reshape(n, height, width)
        return ell, sumo, mu
    return ell, sumo
