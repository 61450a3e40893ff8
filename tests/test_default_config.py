"""Default-configuration regression tests.

Round-1 shipped a regression where ``Parameters()`` (raster_chunk=None) broke
every graph-based posterior because only the Pallas path knew how to
auto-chunk. These tests construct the DEFAULT config — no pinned chunk, no
pinned sizes beyond what keeps CPU runtime sane — and drive the graph
(non-fused) posterior path end to end, exactly the vector that broke.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianposeestimation.jl_tpu.camera import CvCamera
from bayesianposeestimation.jl_tpu.models.experiment_models import (
    association_posterior,
    point_prior,
)
from bayesianposeestimation.jl_tpu.parameters import Experiment, Parameters
from bayesianposeestimation.jl_tpu.utils.mesh_io import cube_mesh


def _default_experiment(params):
    mesh = cube_mesh(0.1)
    cam = CvCamera(width=params.width, height=params.height,
                   f_x=1.2 * params.width, f_y=1.2 * params.width,
                   c_x=(params.width - 1) / 2, c_y=(params.height - 1) / 2)
    scene = {"camera": cam, "verts": jnp.asarray(mesh.vertices),
             "faces": jnp.asarray(mesh.faces)}
    z = jnp.full((params.height, params.width), 1.0, jnp.float32)
    return Experiment(scene, 0.7, jnp.array([0.0, 0.0, 1.0]), depth_image=z)


def test_default_parameters_graph_posterior(key):
    """Default Parameters() (raster_chunk=None) through point_prior ->
    association_posterior -> density evaluation — the round-1 crash vector."""
    params = Parameters()  # defaults: 30x30, raster_chunk=None
    experiment = _default_experiment(params)
    mu = point_prior(params, experiment)
    model = association_posterior(params, experiment, mu)
    s = model.sample_prior(key, 8)
    out = model.tempered_logdensity_sample(s, 0.5)
    assert out.log_prob.shape == (8,)
    assert bool(jnp.all(jnp.isfinite(out.log_prob)))


def test_default_parameters_render_depth():
    """render_depth_batch with chunk=None auto-chunks."""
    from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth_batch

    params = Parameters()
    experiment = _default_experiment(params)
    scene = experiment.scene
    t = jnp.array([[0.0, 0.0, 1.0]])
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    depth = render_depth_batch(scene["verts"], scene["faces"], scene["camera"],
                               t, q, height=params.height, width=params.width,
                               chunk=None)
    assert depth.shape == (1, params.height, params.width)
    hit = np.asarray(depth) > 0
    assert hit.any()
    np.testing.assert_allclose(np.asarray(depth)[hit].min(), 0.95, atol=0.02)


def test_render_crop_fn_traceable(key):
    """render_crop_fn works with traced pose arguments under jit (round-1 had
    a host np.asarray on the pose)."""
    from bayesianposeestimation.jl_tpu.render import render_context, render_crop_fn

    params = Parameters(width=16, height=16)
    experiment = _default_experiment(params)
    ctx = render_context(params)
    t = jnp.array([[0.0, 0.0, 1.0], [0.01, 0.0, 1.0]])
    r = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (2, 1))

    fn = jax.jit(lambda t, r: render_crop_fn(ctx, experiment.scene, 0.2, t, r))
    out = fn(t, r)
    assert out.shape == (2, 16, 16)
    assert bool((out > 0).any())
    # crop camera frames the object: a 0.1 m cube face inside a
    # 1.5*0.2=0.3 m crop covers (0.1/0.3)^2 ~ 11% of pixels
    frac = float((out[0] > 0).mean())
    assert 0.05 < frac < 0.3
