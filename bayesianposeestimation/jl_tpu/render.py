"""Render plumbing: context-free render functions for model nodes.

Parity target: /root/reference/src/RenderContext.jl — ``render_fn`` (:11-14),
``render_crop_fn`` (:21-28), ``render_context`` (:35), ``render`` (:42-49).

TPU-native: there is no offscreen GL context to create or destroy — rendering
is the pure function ``ops.rasterize.render_depth_batch`` compiled into the
posterior's XLA program. ``RenderContext`` survives as a small config record
(image size, triangle chunk) so the reference's constructor names keep
working; the reference's ``depth`` (number of parallel renders, i.e. layered
texture depth) has no analog — any leading batch size works.
"""

from __future__ import annotations

from dataclasses import dataclass

from .camera import crop_camera
from .ops.rasterize import render_depth_batch

__all__ = ["RenderContext", "render_context", "render_fn", "render_crop_fn", "render"]


@dataclass(frozen=True)
class RenderContext:
    width: int
    height: int
    depth: int = 100  # kept for parity; batch size is dynamic on TPU
    chunk: int | None = None  # None -> memory-budget auto-chunk


def render_context(params) -> RenderContext:
    """(parity: RenderContext.jl:35; the device_array_type argument is moot)"""
    return RenderContext(params.width, params.height, params.depth, params.raster_chunk)


def render_fn(context: RenderContext, scene: dict, t, r):
    """Pose-conditioned render node function: t [..., 3], r [..., 4] ->
    μ [..., H, W] (parity: RenderContext.jl:11-14). Arbitrary leading batch
    dims (e.g. [n_tries, n_chains] for MTM) are flattened for the rasterizer.
    Condition on (context, scene) with functools.partial to use as a
    DeterministicNode fn."""
    batch = t.shape[:-1]
    out = render_depth_batch(
        scene["verts"], scene["faces"], scene["camera"],
        t.reshape(-1, 3), r.reshape(-1, 4),
        height=context.height, width=context.width, chunk=context.chunk,
    )
    return out.reshape(*batch, context.height, context.width)


def render_crop_fn(context: RenderContext, scene: dict, diameter, t, r):
    """Render with a camera cropped around the (first) position estimate
    (parity: RenderContext.jl:21-28 — 'assumes that all positions are close').

    Fully traceable: ``t`` may be a traced array; the crop camera is a
    CvCamera pytree with traced intrinsics, so this works under jit/vmap
    (one compile per resolution, not per crop)."""
    center = t.reshape(-1, 3)[0]
    cam = crop_camera(scene["camera"], center, diameter,
                      width=context.width, height=context.height)
    scene_c = {**scene, "camera": cam}
    return render_fn(context, scene_c, t, r)


def render(context: RenderContext, scene: dict, t, r):
    """(parity: render at RenderContext.jl:42-49)"""
    return render_fn(context, scene, t, r)
