"""Pinhole (OpenCV-convention) camera intrinsics and crop cameras.

Rebuilds the ``CvCamera`` surface of SciGL.jl that the reference uses
(/root/reference/test/posterior_model.jl:22, /root/reference/src/ParticleFilter.jl:219-229,
crop cameras at /root/reference/src/RenderContext.jl:21-28).

Convention: x right, y down, z forward (OpenCV). A 3D point ``p`` in camera
coordinates projects to pixel ``u = fx*x/z + s*y/z + cx``, ``v = fy*y/z + cy``.
Pixel (0, 0) is the top-left pixel center.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

__all__ = ["CvCamera", "crop_camera", "reproject_3d", "depth_to_distance",
           "crop_image"]


@dataclass(frozen=True)
class CvCamera:
    """OpenCV-style pinhole intrinsics.

    Registered as a pytree: the intrinsics (f_x, f_y, c_x, c_y, s) are
    traced leaves, while (width, height, near, far) stay static — so per-image
    crop cameras flow through jitted render/score programs WITHOUT
    recompilation (one compile per resolution, not per image)."""

    width: int
    height: int
    f_x: float
    f_y: float
    c_x: float
    c_y: float
    s: float = 0.0  # skew
    near: float = 0.01
    far: float = 100.0

    def intrinsic_matrix(self, dtype=jnp.float32):
        return jnp.asarray(
            [
                [self.f_x, self.s, self.c_x],
                [0.0, self.f_y, self.c_y],
                [0.0, 0.0, 1.0],
            ],
            dtype=dtype,
        )

    def scale_to(self, width: int, height: int) -> "CvCamera":
        """Rescale the intrinsics to a different image resolution."""
        sx = width / self.width
        sy = height / self.height
        return replace(
            self,
            width=width,
            height=height,
            f_x=self.f_x * sx,
            f_y=self.f_y * sy,
            c_x=(self.c_x + 0.5) * sx - 0.5,
            c_y=(self.c_y + 0.5) * sy - 0.5,
            s=self.s * sx,
        )


jax.tree_util.register_pytree_node(
    CvCamera,
    lambda c: ((c.f_x, c.f_y, c.c_x, c.c_y, c.s), (c.width, c.height, c.near, c.far)),
    lambda aux, leaves: CvCamera(
        width=aux[0], height=aux[1],
        f_x=leaves[0], f_y=leaves[1], c_x=leaves[2], c_y=leaves[3], s=leaves[4],
        near=aux[2], far=aux[3],
    ),
)


def crop_image(img, full_cam: CvCamera, crop_cam: CvCamera):
    """Resample an image through a crop camera's intrinsics (nearest,
    invalid-preserving). Host/numpy or jnp."""
    import numpy as np

    u = (np.arange(crop_cam.width) - np.asarray(crop_cam.c_x)) / np.asarray(crop_cam.f_x)
    v = (np.arange(crop_cam.height) - np.asarray(crop_cam.c_y)) / np.asarray(crop_cam.f_y)
    su = np.clip((u * np.asarray(full_cam.f_x) + np.asarray(full_cam.c_x)).round().astype(int),
                 0, img.shape[1] - 1)
    sv = np.clip((v * np.asarray(full_cam.f_y) + np.asarray(full_cam.c_y)).round().astype(int),
                 0, img.shape[0] - 1)
    return np.asarray(img)[sv][:, su]


def crop_camera(camera: CvCamera, center_3d, diameter: float, scale: float = 1.5,
                width: int | None = None, height: int | None = None) -> CvCamera:
    """Camera that views a square crop of ``scale * diameter`` around the
    projected ``center_3d``, rendered at (width, height).

    Parity: SciGL's ``crop``/``crop_camera`` used at
    /root/reference/src/RenderContext.jl:21-28 and PoseErrors' ``crop_camera``.
    The crop is realized purely through intrinsics (principal-point shift +
    focal rescale) so the renderer needs no special casing.
    """
    width = camera.width if width is None else width
    height = camera.height if height is None else height
    # no host casts: center_3d may be a traced array (render_crop_fn under
    # jit); the returned CvCamera is a pytree with traced intrinsics.
    x, y, z = center_3d[0], center_3d[1], center_3d[2]
    # projected center in the original image
    u0 = camera.f_x * x / z + camera.s * y / z + camera.c_x
    v0 = camera.f_y * y / z + camera.c_y
    # crop box side length in source pixels: object of `scale*diameter` meters at depth z
    side_x = camera.f_x * scale * diameter / z
    side_y = camera.f_y * scale * diameter / z
    left = u0 - side_x / 2
    top = v0 - side_y / 2
    sx = width / side_x
    sy = height / side_y
    return CvCamera(
        width=width,
        height=height,
        f_x=camera.f_x * sx,
        f_y=camera.f_y * sy,
        c_x=(camera.c_x - left) * sx,
        c_y=(camera.c_y - top) * sy,
        s=camera.s * sx,
        near=camera.near,
        far=camera.far,
    )


def reproject_3d(u, v, z, camera: CvCamera):
    """Pixel (u, v) at depth z -> 3D point in camera coordinates.

    Parity: PoseErrors' ``reproject_3D`` used by ``point_from_segmentation``
    (/root/reference/src/ExperimentModels.jl:22-39)."""
    y = (v - camera.c_y) * z / camera.f_y
    # inverting u = f_x*x/z + s*y/z + c_x:  x = (u - c_x)*z/f_x - s*y/f_x
    x = (u - camera.c_x) * z / camera.f_x - camera.s * y / camera.f_x
    return x, y, z


def depth_to_distance(depth_img, camera: CvCamera):
    """Convert a z-depth image to a ray-distance image (PoseErrors parity,
    used for BOP18 VSD at /root/reference/src/Evaluation.jl:56-58)."""
    h, w = depth_img.shape[-2], depth_img.shape[-1]
    u = jnp.arange(w, dtype=depth_img.dtype)
    v = jnp.arange(h, dtype=depth_img.dtype)
    uu, vv = jnp.meshgrid(u, v)
    x = (uu - camera.c_x) / camera.f_x
    y = (vv - camera.c_y) / camera.f_y
    scale = jnp.sqrt(x * x + y * y + 1.0)
    return depth_img * scale
