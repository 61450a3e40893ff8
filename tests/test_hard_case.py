"""The pinned failure mode: sphere-behind-sphere at visibility ~0.45.

Round-2 finding (VERDICT r2 missing #3): when ~55% of a sphere is occluded
by another instance of the same object, the occluder's pose genuinely
out-scores the true pose under the association posterior — the chain
estimating the REAR instance converges onto the FRONT instance's mode, and
BOP matching then counts it as a failure (the front gt is already taken by
the better-scoring front estimate).

This test pins the MECHANISM as an executable artifact: the posterior
logdensity at the wrong (occluder) pose exceeds the true (rear) pose. It is
asserted as-is — not xfail — because the inversion is a property of the
model, not a bug in the implementation: with o_mask_is prior on the visible
mask, the wrong mode explains every unoccluded pixel while the true mode
pays the occlusion tail for ~55% of its silhouette.

The dataset-level artifact lives in the ``hard`` split
(``python scripts/make_synthetic_bop.py --profile hard`` then
``python scripts/smc_bop_val.py --testset hard --experiment-name
hard_cases``), which records per-case matched errors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayesianposeestimation.jl_tpu import quaternions as quat
from bayesianposeestimation.jl_tpu.camera import CvCamera, crop_camera, crop_image
from bayesianposeestimation.jl_tpu.models.fused import fused_posterior
from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth
from bayesianposeestimation.jl_tpu.parameters import Experiment, Parameters
from bayesianposeestimation.jl_tpu.samples import Sample
from bayesianposeestimation.jl_tpu.utils import mesh_io


@pytest.fixture(scope="module")
def hard_scene():
    """Two spheres, rear at visib ~0.45, pipeline-style 30x30 crop around the
    rear instance with the rear visible mask as association prior."""
    mesh = mesh_io.icosphere_mesh(0.04, 2)
    diam = mesh_io.mesh_diameter(mesh)
    full_cam = CvCamera(width=640, height=480, f_x=580.0, f_y=580.0,
                        c_x=319.5, c_y=239.5, near=0.01, far=10.0)
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    t_front = jnp.asarray([0.0, 0.0, 1.0])
    q_front = quat.rand_quaternion(jax.random.PRNGKey(3))
    t_rear = jnp.asarray([0.38 * diam, 0.0, 1.0 + 0.45 * diam])
    q_rear = quat.rand_quaternion(jax.random.PRNGKey(4))
    d_front = np.asarray(render_depth(verts, faces, full_cam, t_front, q_front))
    d_rear = np.asarray(render_depth(verts, faces, full_cam, t_rear, q_rear))
    f_inf = np.where(d_front > 0, d_front, np.inf)
    r_inf = np.where(d_rear > 0, d_rear, np.inf)
    composite = np.minimum(f_inf, r_inf)
    obs_full = np.where(np.isfinite(composite), composite, 1.5)
    rear_visible = (d_rear > 0) & (r_inf <= composite + 1e-3)
    visib = rear_visible.sum() / max((d_rear > 0).sum(), 1)
    assert 0.35 < visib < 0.55, visib  # the pinned regime

    params = Parameters(width=30, height=30)
    cam = crop_camera(full_cam, np.asarray(t_rear), diam, width=30, height=30)
    obs = crop_image(obs_full, full_cam, cam)
    mask_crop = crop_image(rear_visible.astype(np.float32), full_cam, cam)
    prior_o = np.where(mask_crop > 0.5, params.o_mask_is, params.o_mask_not)
    scene = {"camera": cam, "verts": verts, "faces": faces}
    experiment = Experiment(scene=scene,
                            prior_o=jnp.asarray(prior_o, jnp.float32),
                            prior_t=t_rear,
                            depth_image=jnp.asarray(obs, jnp.float32))
    posterior = fused_posterior(params, experiment, "association")
    return dict(posterior=posterior, t_front=t_front, q_front=q_front,
                t_rear=t_rear, q_rear=q_rear, visib=float(visib))


def _loglike(posterior, t, q):
    s = Sample({"t": t[None], "r": q[None]})
    return float(posterior.logdensity_sample(s).log_like[0])


def test_wrong_mode_outscores_true_pose(hard_scene):
    """The occluder's pose scores higher than the ground-truth rear pose —
    the recorded failure mechanism, pinned as data."""
    p = hard_scene["posterior"]
    ll_true = _loglike(p, hard_scene["t_rear"], hard_scene["q_rear"])
    ll_wrong = _loglike(p, hard_scene["t_front"], hard_scene["q_front"])
    assert ll_wrong > ll_true, (
        f"expected the front-instance mode ({ll_wrong:.1f}) to out-score the "
        f"true rear pose ({ll_true:.1f}) at visib {hard_scene['visib']:.2f} — "
        "if this now FAILS, the model has been improved enough to retire the "
        "hard-case pin (update data/exp_pro/hard_cases accordingly)")


def test_true_pose_beats_random(hard_scene):
    """Sanity floor: the true rear pose still scores far above an unrelated
    pose — the failure is a two-mode ambiguity, not a broken likelihood."""
    p = hard_scene["posterior"]
    ll_true = _loglike(p, hard_scene["t_rear"], hard_scene["q_rear"])
    ll_off = _loglike(p, hard_scene["t_rear"] + jnp.asarray([0.2, 0.0, 0.0]),
                      hard_scene["q_rear"])
    assert ll_true > ll_off + 10.0
