"""Camera reprojection + segmentation-prior geometry.

Covers reproject_3d (incl. the nonzero-skew inversion, ADVICE r1) and
point_from_segmentation's surface-to-center ray push (parity target:
/root/reference/src/ExperimentModels.jl:22-39 + PoseErrors reproject_3D).
"""

import jax.numpy as jnp
import numpy as np

from bayesianposeestimation.jl_tpu import quaternions as quat
from bayesianposeestimation.jl_tpu.camera import CvCamera, reproject_3d
from bayesianposeestimation.jl_tpu.models.experiment_models import (
    point_from_segmentation,
)
from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth
from bayesianposeestimation.jl_tpu.utils.mesh_io import icosphere_mesh


def _project(p, cam):
    x, y, z = p
    u = cam.f_x * x / z + cam.s * y / z + cam.c_x
    v = cam.f_y * y / z + cam.c_y
    return u, v


def test_reproject_3d_inverts_projection_with_skew():
    cam = CvCamera(width=64, height=64, f_x=70.0, f_y=65.0, c_x=31.0,
                   c_y=33.0, s=2.5)
    for p in ([0.05, -0.03, 0.9], [-0.02, 0.08, 1.3], [0.0, 0.0, 1.0]):
        u, v = _project(p, cam)
        x, y, z = reproject_3d(u, v, p[2], cam)
        np.testing.assert_allclose([x, y, z], p, atol=1e-6)


def test_point_from_segmentation_center_correction():
    """The masked median depth lies on the VISIBLE surface; the
    diameter-scaled ray push must land the prior near the object CENTER
    (exact geometry on a sphere: center = surface + ~r along the ray)."""
    cam = CvCamera(width=96, height=96, f_x=110.0, f_y=110.0, c_x=47.5,
                   c_y=47.5, near=0.01, far=10.0)
    mesh = icosphere_mesh(0.05, 3)
    center = jnp.array([0.02, -0.01, 1.0])
    depth = np.asarray(render_depth(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces), cam,
        center, quat.quat_identity()))
    mask = depth > 0
    assert mask.sum() > 50
    ys, xs = np.nonzero(mask)
    bbox = (xs.min(), xs.max(), ys.min(), ys.max())
    diameter = 0.1

    raw = point_from_segmentation(bbox, depth, mask, cam)
    pushed = point_from_segmentation(bbox, depth, mask, cam,
                                     diameter=diameter)
    err_raw = np.linalg.norm(raw - np.asarray(center))
    err_pushed = np.linalg.norm(pushed - np.asarray(center))
    # raw point sits on the front surface: biased toward the camera by ~r
    assert raw[2] < center[2] - 0.02
    # the push recovers most of the bias
    assert err_pushed < 0.5 * err_raw
    assert err_pushed < 0.02
    # no diameter -> unchanged legacy behavior (reference parity)
    np.testing.assert_allclose(
        raw, point_from_segmentation(bbox, depth, mask, cam), atol=0)
