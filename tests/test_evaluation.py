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


def test_match_errors_all_inf_estimate_does_not_consume_gt():
    """An estimate with no finite error must not take a gt slot (round-1 bug:
    the finite check was dead code)."""
    scores = [10.0, 1.0]  # first (all-inf) estimate has the best score
    errors = np.array([[np.inf, np.inf],
                       [0.01, 0.5]])
    out = ev.match_errors(scores, errors)
    # the good estimate still matches gt 0 despite losing the score order
    assert out[0] == pytest.approx(0.01)
    assert np.isinf(out[1])


def test_match_scene_errors_swapped_estimates():
    """Multi-instance image where each estimate converged to the OTHER
    instance: per-own-gt evaluation scores 0/2 correct, greedy matching
    recovers 2/2 (the reference's BOP semantics, Evaluation.jl:109-147)."""

    def row(gt_id, t, score):
        return dict(scene_id=1, img_id=0, obj_id=1, gt_id=gt_id, t=t,
                    q=[1, 0, 0, 0], score=score, gt_t=None, gt_R=None,
                    visib_fract=1.0)

    # estimate for gt 0 found instance 1 and vice versa
    rows = [row(0, "near_gt1", 5.0), row(1, "near_gt0", 4.0)]

    def errors_fn(ests, gt_rows):
        # error[i, j]: est i vs gt j; swapped convergence
        mat = np.array([[0.9, 0.02],   # est 0 is near gt 1
                        [0.03, 0.8]])  # est 1 is near gt 0
        n_tau = len(ev.BOP19_THRESHOLDS)
        return {"adds": mat, "vsd": mat,
                "vsdbop": np.repeat(mat[:, :, None], n_tau, axis=2)}

    matched = ev.match_scene_errors(rows, errors_fn)
    # unmatched diagonal evaluation would be [0.9, 0.8] -> recall 0
    unmatched_recall = ev.recall(*ev.threshold_errors(np.array([0.9, 0.8]),
                                                      ev.ADDS_THETA))
    matched_recall = ev.recall(*ev.threshold_errors(matched["adds"],
                                                    ev.ADDS_THETA))
    assert unmatched_recall == 0.0
    assert matched_recall == 1.0
    np.testing.assert_allclose(np.sort(matched["adds"]), [0.02, 0.03])


def test_match_scene_errors_visib_filter():
    """gts below 10% visibility are excluded from the recall denominator
    (parity: Evaluation.jl:196-215)."""

    def row(gt_id, visib, score):
        return dict(scene_id=1, img_id=0, obj_id=1, gt_id=gt_id, t=gt_id,
                    q=[1, 0, 0, 0], score=score, gt_t=None, gt_R=None,
                    visib_fract=visib)

    rows = [row(0, 1.0, 5.0), row(1, 0.05, 4.0)]

    def errors_fn(ests, gt_rows):
        # only the visible gt survives the filter
        assert len(gt_rows) == 1 and gt_rows[0]["gt_id"] == 0
        mat = np.full((len(ests), 1), 0.05)
        n_tau = len(ev.BOP19_THRESHOLDS)
        return {"adds": mat, "vsd": mat,
                "vsdbop": np.repeat(mat[:, :, None], n_tau, axis=2)}

    matched = ev.match_scene_errors(rows, errors_fn)
    assert matched["adds"].shape == (1,)
    assert matched["vsdbop"].shape == (1, len(ev.BOP19_THRESHOLDS))
