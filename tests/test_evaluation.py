"""BOP metric tests: ADD-S, VSD, matching, recall, step-time calibration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianposeestimation.jl_tpu import quaternions as quat
from bayesianposeestimation.jl_tpu.camera import CvCamera
from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth
from bayesianposeestimation.jl_tpu.utils import evaluation as ev
from bayesianposeestimation.jl_tpu.utils.mesh_io import cube_mesh, icosphere_mesh, mesh_diameter

CAM = CvCamera(width=32, height=32, f_x=48.0, f_y=48.0, c_x=15.5, c_y=15.5, near=0.01, far=10.0)


def test_adds_zero_for_identical_pose():
    mesh = cube_mesh(0.1)
    pts = jnp.asarray(mesh.vertices)
    t = jnp.array([0.0, 0.0, 1.0])
    q = quat.quat_identity()
    assert float(ev.adds_error(pts, t, q, t, q)) == pytest.approx(0.0, abs=1e-6)


def test_adds_translation_offset():
    mesh = icosphere_mesh(0.05, 2)
    pts = jnp.asarray(mesh.vertices)
    t = jnp.array([0.0, 0.0, 1.0])
    q = quat.quat_identity()
    t2 = t + jnp.array([0.2, 0.0, 0.0])
    # large offset: nearest-neighbor distance ~ offset - diameter-ish, but
    # for a far translation the error approaches the offset
    err = float(ev.adds_error(pts, t2, q, t, q))
    assert 0.09 < err <= 0.201


def test_adds_symmetry_friendly():
    """A sphere rotated arbitrarily has ~zero ADD-S (the point of ADD-S)."""
    mesh = icosphere_mesh(0.05, 3)
    pts = jnp.asarray(mesh.vertices)
    t = jnp.array([0.0, 0.0, 1.0])
    q1 = quat.quat_identity()
    q2 = quat.qexp(jnp.array([0.7, -0.3, 0.5]))
    d = mesh_diameter(mesh)
    err = float(ev.normalized_adds_error(pts, t, q2, t, q1, d))
    # icosphere-3 vertices are ~3 deg apart: nearest-neighbor residual ~3% of
    # the diameter, still far below the 0.1 correctness threshold
    assert err < 0.05


def test_vsd_identical_zero():
    mesh = cube_mesh(0.1)
    scene = {"verts": jnp.asarray(mesh.vertices), "faces": jnp.asarray(mesh.faces)}
    t = jnp.array([0.0, 0.0, 1.0])
    q = quat.quat_identity()
    depth = render_depth(scene["verts"], scene["faces"], CAM, t, q)
    err = float(ev.vsd_error(scene, CAM, depth, t, q, t, q, tau=0.02))
    assert err == pytest.approx(0.0, abs=1e-6)


def test_vsd_far_off_is_one():
    mesh = cube_mesh(0.1)
    scene = {"verts": jnp.asarray(mesh.vertices), "faces": jnp.asarray(mesh.faces)}
    t = jnp.array([0.0, 0.0, 1.0])
    q = quat.quat_identity()
    depth = render_depth(scene["verts"], scene["faces"], CAM, t, q)
    t_wrong = t + jnp.array([0.0, 0.0, 0.5])
    err = float(ev.vsd_error(scene, CAM, depth, t_wrong, q, t, q, tau=0.02))
    assert err > 0.9


def test_vsdbop_monotone_in_tau():
    mesh = cube_mesh(0.1)
    scene = {"verts": jnp.asarray(mesh.vertices), "faces": jnp.asarray(mesh.faces)}
    t = jnp.array([0.0, 0.0, 1.0])
    q = quat.quat_identity()
    depth = render_depth(scene["verts"], scene["faces"], CAM, t, q)
    t2 = t + jnp.array([0.0, 0.0, 0.02])
    d = mesh_diameter(mesh)
    errs = np.asarray(ev.normalized_vsd_error(scene, CAM, depth, t2, q, t, q, d))
    assert errs.shape == (len(ev.BOP19_THRESHOLDS),)
    assert np.all(np.diff(errs) <= 1e-6)  # larger tau -> smaller error


def test_match_errors_greedy():
    # 2 estimates, 3 gts; best-scored estimate picks its best gt first
    scores = [0.9, 0.5]
    errors = np.array([[0.2, 0.05, 0.6], [0.1, 0.06, 0.7]])
    out = ev.match_errors(scores, errors)
    assert out[1] == pytest.approx(0.05)  # est0 -> gt1
    assert out[0] == pytest.approx(0.1)  # est1 -> gt0
    assert np.isinf(out[2])  # unmatched


def test_threshold_and_recall():
    errors = [0.05, 0.2, np.inf, 0.08]
    n_correct, n_total = ev.threshold_errors(errors, ev.ADDS_THETA)
    assert (n_correct, n_total) == (2, 4)
    assert ev.recall(n_correct, n_total) == pytest.approx(0.5)


def test_mean_step_time_and_budget(key):
    from bayesianposeestimation.jl_tpu.distributions import Normal
    from bayesianposeestimation.jl_tpu.graph import BroadcastedNode, sequentialize
    from bayesianposeestimation.jl_tpu.posterior import PosteriorModel
    from bayesianposeestimation.jl_tpu.proposals import symmetric_proposal
    from bayesianposeestimation.jl_tpu.samplers import MetropolisHastings
    from bayesianposeestimation.jl_tpu.tempering import ConstantSchedule

    x = BroadcastedNode("x", Normal, 0.0, 1.0)
    y = BroadcastedNode("y", Normal, x, 0.5) | jnp.float32(1.0)
    model = PosteriorModel(y)
    q = symmetric_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 0.5)), model)
    sampler = MetropolisHastings(q, ConstantSchedule())
    st = ev.mean_step_time(key, model, sampler, n_particles=16, max_seconds=0.2)
    assert 0 < st < 0.2
    n = ev.steps_for_time_budget(st, 0.5)
    assert n >= 2
    assert ev.steps_for_time_budget(10.0, 0.5) == 2  # floor
