"""Rasterizer validation: analytic geometry + golden NumPy parity.

Mirrors the reference's renderer integration checks
(/root/reference/test/posterior_model.jl:22-27: cube at 30x30)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianposeestimation.jl_tpu import quaternions as quat
from bayesianposeestimation.jl_tpu.camera import CvCamera, crop_camera
from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth, render_depth_batch
from bayesianposeestimation.jl_tpu.utils.mesh_io import cube_mesh, icosphere_mesh, monkey_mesh

from golden_raster import golden_render_depth

CAM = CvCamera(width=30, height=30, f_x=30.0, f_y=30.0, c_x=14.5, c_y=14.5, near=0.01, far=10.0)


def _jnp_mesh(mesh):
    return jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)


def test_cube_frontal_depth_analytic():
    """Cube of side 0.1 at z=1: front face plane must read exactly 0.95."""
    verts, faces = _jnp_mesh(cube_mesh(0.1))
    t = jnp.array([0.0, 0.0, 1.0])
    q = quat.quat_identity()
    depth = render_depth(verts, faces, CAM, t, q)
    d = np.asarray(depth)
    hit = d > 0
    assert hit.any()
    # hit pixels show the front face at z = 0.95, except boundary pixels that
    # may fall inside the 0.15px-thin edge-on side-face slivers (depth up to
    # 1.05) — a knife-edge case sensitive to f32 rounding
    assert np.all((d[hit] >= 0.95 - 1e-3) & (d[hit] <= 1.05 + 1e-3))
    assert np.isclose(d[15, 15], 0.95, atol=1e-3)
    assert np.mean(np.isclose(d[hit], 0.95, atol=1e-3)) > 0.8
    # projected half-extent: f_x * 0.05 / 0.95 = 1.58 px around center
    ys, xs = np.nonzero(hit)
    assert 13 <= xs.min() and xs.max() <= 16
    assert 13 <= ys.min() and ys.max() <= 16


def test_cube_background_zero():
    verts, faces = _jnp_mesh(cube_mesh(0.1))
    depth = render_depth(verts, faces, CAM, jnp.array([0.0, 0.0, 1.0]), quat.quat_identity())
    d = np.asarray(depth)
    assert d[0, 0] == 0.0 and d[-1, -1] == 0.0


def test_behind_camera_invisible():
    verts, faces = _jnp_mesh(cube_mesh(0.1))
    depth = render_depth(verts, faces, CAM, jnp.array([0.0, 0.0, -1.0]), quat.quat_identity())
    assert float(jnp.max(depth)) == 0.0


@pytest.mark.parametrize("mesh_fn,tol_px", [(cube_mesh, 0.02), (icosphere_mesh, 0.02)])
def test_golden_parity(mesh_fn, tol_px, key):
    """Dense edge-function rasterizer vs scalar golden implementation for
    random poses: same coverage (up to boundary pixels) and same depths."""
    mesh = mesh_fn(0.1) if mesh_fn is cube_mesh else mesh_fn(0.05, 1)
    verts, faces = _jnp_mesh(mesh)
    keys = jax.random.split(key, 4)
    for i, k in enumerate(keys):
        q = quat.rand_quaternion(k)
        t = jnp.array([0.02 * i - 0.03, 0.01 * i, 1.0 + 0.1 * i])
        ours = np.asarray(render_depth(verts, faces, CAM, t, q))
        gold = golden_render_depth(
            np.asarray(verts, np.float64), np.asarray(faces), CAM, np.asarray(t, np.float64),
            np.asarray(q, np.float64), 30, 30
        )
        ours_hit = ours > 0
        gold_hit = gold > 0
        # coverage may differ on triangle-boundary pixels (f32 vs f64 edge
        # functions); allow a small fraction of disagreement
        disagree = np.mean(ours_hit != gold_hit)
        assert disagree < 0.02, f"pose {i}: coverage disagreement {disagree}"
        both = ours_hit & gold_hit
        if both.any():
            diffs = np.abs(ours[both] - gold[both])
            # interior pixels must match tightly; pixels on shared triangle
            # edges may pick a different (glancing) winner under f32 jitter —
            # allow a small fraction with larger error (sub-pixel silhouette
            # noise, present in any rasterizer incl. the reference's OpenGL)
            assert np.median(diffs) < 1e-4
            assert np.mean(diffs < 1e-3) > 0.9, f"pose {i}: {np.mean(diffs < 1e-3)}"
            assert diffs.max() < 0.05


def test_batch_matches_single(key):
    mesh = cube_mesh(0.1)
    verts, faces = _jnp_mesh(mesh)
    n = 7
    q = quat.rand_quaternion(key, (n,))
    t = jnp.array([0.0, 0.0, 1.0]) + 0.05 * jax.random.normal(key, (n, 3))
    batch = render_depth_batch(verts, faces, CAM, t, q)
    assert batch.shape == (n, 30, 30)
    for i in range(0, n, 3):
        single = render_depth(verts, faces, CAM, t[i], q[i])
        np.testing.assert_allclose(batch[i], single, atol=1e-6)


def test_chunking_invariance(key):
    """Result independent of the triangle chunk size (scan correctness)."""
    mesh = monkey_mesh(0.08)
    verts, faces = _jnp_mesh(mesh)
    t = jnp.array([[0.0, 0.0, 0.5]])
    q = quat.rand_quaternion(key, (1,))
    a = render_depth_batch(verts, faces, CAM, t, q, chunk=64)
    b = render_depth_batch(verts, faces, CAM, t, q, chunk=512)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_crop_camera_rendering():
    """Crop camera zooms into the object: more hit pixels than full view."""
    mesh = cube_mesh(0.1)
    verts, faces = _jnp_mesh(mesh)
    t = jnp.array([0.0, 0.0, 1.0])
    q = quat.quat_identity()
    full = render_depth(verts, faces, CAM, t, q)
    ccam = crop_camera(CAM, np.array([0.0, 0.0, 1.0]), diameter=0.1 * np.sqrt(3))
    crop = render_depth(verts, faces, ccam, t, q)
    assert float(jnp.sum(crop > 0)) > 4 * float(jnp.sum(full > 0))
    # depth values unchanged by cropping
    np.testing.assert_allclose(np.asarray(crop)[crop > 0].min(), 0.95, atol=1e-3)


def test_occlusion_two_spheres():
    """Nearer surface wins the z-buffer min."""
    m = icosphere_mesh(0.05, 1)
    # two spheres: one at z=1, one at z=0.7 (in front), same screen position
    verts = np.concatenate([m.vertices + [0, 0, 1.0], m.vertices + [0, 0, 0.7]])
    faces = np.concatenate([m.faces, m.faces + m.n_vertices])
    depth = render_depth(jnp.asarray(verts), jnp.asarray(faces), CAM,
                         jnp.zeros(3), quat.quat_identity())
    d = np.asarray(depth)
    center = d[14:16, 14:16]
    assert np.all((center > 0.6) & (center < 0.7))
