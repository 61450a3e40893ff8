"""Smoke tests for the plotting suite (Agg backend, no display)."""

import numpy as np

from bayesianposeestimation.jl_tpu.utils import visualization as viz


def test_plots_smoke(tmp_path):
    viz.diss_defaults()
    rng = np.random.default_rng(0)
    depth = np.where(rng.uniform(size=(24, 24)) > 0.3, rng.uniform(0.8, 1.2, (24, 24)), 0.0)
    fig = viz.plot_depth_img(depth, title="depth")
    fig.savefig(tmp_path / "depth.png")
    fig = viz.plot_prob_img(rng.uniform(size=(24, 24)))
    fig.savefig(tmp_path / "prob.png")

    ts = rng.normal(0, 0.01, (50, 8, 3)) + [0, 0, 1]
    qs = rng.normal(size=(50, 8, 4))
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    fig = viz.plot_pose_chain(ts, qs, gt_t=[0, 0, 1])
    fig.savefig(tmp_path / "chain.png")
    fig = viz.plot_pose_density(ts[-1])
    fig.savefig(tmp_path / "density.png")
    fig = viz.plot_logprob(rng.normal(size=(50, 8)))
    fig.savefig(tmp_path / "logprob.png")
    fig = viz.plot_logevidence(np.cumsum(rng.normal(size=50)))
    fig.savefig(tmp_path / "evidence.png")
    fig = viz.plot_recall_curves({"smc": rng.uniform(0, 1, 100)}, theta_marker=0.3)
    fig.savefig(tmp_path / "recall.png")
    fig = viz.plot_scene_ontop(depth, (depth > 1.0).astype(float))
    fig.savefig(tmp_path / "overlay.png")

    mean = viz.mean_image(rng.uniform(size=(8, 24, 24)), np.log(np.full(8, 1 / 8)))
    assert mean.shape == (24, 24)

    def render_fn(t, q):
        return depth

    fig = viz.plot_best_pose(render_fn, ts[-1], qs[-1], rng.normal(size=8), obs_img=depth)
    fig.savefig(tmp_path / "best.png")
    assert (tmp_path / "best.png").stat().st_size > 0
