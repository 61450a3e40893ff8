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


def test_mean_image_weighting_correct():
    """Weighted mean_image must honor the log weights exactly."""
    import numpy as np

    from bayesianposeestimation.jl_tpu.utils.visualization import mean_image

    imgs = np.stack([np.full((4, 4), 1.0), np.full((4, 4), 3.0)])
    # all mass on image 0
    out = mean_image(imgs, log_weights=np.array([0.0, -np.inf]))
    np.testing.assert_allclose(out, 1.0)
    # uniform weights = plain mean
    out = mean_image(imgs, log_weights=np.log([0.5, 0.5]))
    np.testing.assert_allclose(out, 2.0)
    # 3:1 mass
    out = mean_image(imgs, log_weights=np.log([0.75, 0.25]))
    np.testing.assert_allclose(out, 1.5)
    # shift-invariance in log domain
    out2 = mean_image(imgs, log_weights=np.log([0.75, 0.25]) + 123.0)
    np.testing.assert_allclose(out2, 1.5)


def test_plot_pose_density_weighted():
    """Weighted density: a dominant particle dominates the histogram mass."""
    import numpy as np

    from bayesianposeestimation.jl_tpu.utils.visualization import plot_pose_density

    ts = np.concatenate([np.zeros((50, 3)), np.ones((50, 3))])
    lw = np.concatenate([np.full(50, 0.0), np.full(50, -50.0)])
    fig = plot_pose_density(ts, bins=2, log_weights=lw)
    ax = fig.axes[0]
    heights = [p.get_height() for p in ax.patches[:2]]
    # essentially all mass in the bin at 0
    assert heights[0] > 100 * max(heights[1], 1e-12)
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_recall_vs_visibility_clips_float_dust(tmp_path):
    """CSVs written before recall_ci clamped its interval can carry
    ci_hi = recall - 2e-16 at full recall; the plot must clip, not raise
    (matplotlib rejects negative yerr)."""
    import pandas as pd

    df = pd.DataFrame([
        dict(sampler="smc_mh", visib_lo=0.1, visib_hi=0.3, n_gt=6,
             vsd_recall=0.5, ci_lo=0.19, ci_hi=0.81),
        dict(sampler="smc_mh", visib_lo=0.3, visib_hi=0.5, n_gt=16,
             vsd_recall=1.0, ci_lo=0.806, ci_hi=1.0 - 2e-16),
        dict(sampler="mh_sampler", visib_lo=0.1, visib_hi=0.3, n_gt=6,
             vsd_recall=0.0, ci_lo=0.0 + 2e-16, ci_hi=0.39),
    ])
    fig = viz.plot_recall_vs_visibility(df)
    fig.savefig(tmp_path / "visib.png")
    assert (tmp_path / "visib.png").stat().st_size > 0
