"""Plots: depth/probability heatmaps, pose chains, evidence, recall curves.

Parity target: /root/reference/src/Visualization.jl — dissertation theme
``diss_defaults`` (:18-38), depth/probability heatmaps (:42-124), best-pose
overlays (:160-200), weighted ``mean_image`` (:202-214), chain/density/
evidence plots (:249-314) — rebuilt on matplotlib (the reference uses
CairoMakie).

All functions return the matplotlib Figure so scripts can save or show.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "diss_defaults",
    "plot_depth_img",
    "plot_prob_img",
    "plot_best_pose",
    "plot_scene_ontop",
    "mean_image",
    "plot_pose_chain",
    "plot_pose_density",
    "plot_logprob",
    "plot_logevidence",
    "plot_recall_curves",
    "plot_recall_vs_visibility",
]


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def diss_defaults():
    """Publication-style defaults (parity: diss_defaults at Visualization.jl:18-38)."""
    import matplotlib

    matplotlib.rcParams.update({
        "figure.dpi": 150,
        "font.size": 9,
        "axes.grid": True,
        "grid.alpha": 0.3,
        "figure.constrained_layout.use": True,
    })


def plot_depth_img(img, ax=None, title=None):
    """Depth heatmap; invalid (0/inf) pixels masked out
    (parity: Visualization.jl:42-78)."""
    plt = _plt()
    img = np.asarray(img, float)
    masked = np.ma.masked_where(~np.isfinite(img) | (img <= 0), img)
    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    im = ax.imshow(masked, cmap="viridis")
    fig.colorbar(im, ax=ax, label="depth / m")
    if title:
        ax.set_title(title)
    return fig


def plot_prob_img(img, ax=None, title=None):
    """Probability heatmap in [0, 1] (parity: Visualization.jl:80-124)."""
    plt = _plt()
    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    im = ax.imshow(np.asarray(img, float), cmap="magma", vmin=0, vmax=1)
    fig.colorbar(im, ax=ax, label="probability")
    if title:
        ax.set_title(title)
    return fig


def mean_image(images, log_weights=None):
    """Weighted mean over the particle axis
    (parity: mean_image at Visualization.jl:202-214)."""
    images = np.asarray(images, float)
    if log_weights is None:
        return images.mean(axis=0)
    w = np.exp(np.asarray(log_weights) - np.max(log_weights))
    w = w / w.sum()
    return np.tensordot(w, images, axes=1)


def plot_best_pose(render_depth_fn, ts, qs, log_likes, obs_img=None):
    """Render the max-likelihood pose and overlay it on the observation
    (parity: plot_best_pose at Visualization.jl:160-200)."""
    plt = _plt()
    best = int(np.argmax(np.asarray(log_likes)))
    depth = np.asarray(render_depth_fn(np.asarray(ts)[best], np.asarray(qs)[best]))
    fig, axes = plt.subplots(1, 2 if obs_img is not None else 1, squeeze=False)
    plot_depth_img(depth, ax=axes[0][0], title="best pose render")
    if obs_img is not None:
        plot_scene_ontop(obs_img, depth, ax=axes[0][1])
    return fig


def plot_scene_ontop(obs_img, render_img, ax=None, alpha=0.6):
    """Overlay a render silhouette on the observed image
    (parity: plot_scene_ontop at Visualization.jl:160-178)."""
    plt = _plt()
    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    obs = np.asarray(obs_img, float)
    obs = np.ma.masked_where(~np.isfinite(obs) | (obs <= 0), obs)
    ax.imshow(obs, cmap="gray")
    mask = np.asarray(render_img) > 0
    overlay = np.zeros((*mask.shape, 4))
    overlay[mask] = (1.0, 0.3, 0.1, alpha)
    ax.imshow(overlay)
    ax.set_title("estimate on observation")
    return fig


def plot_pose_chain(ts, qs, gt_t=None, gt_q=None):
    """Per-dimension translation traces + rotation-angle trace
    (parity: plot_pose_chain at Visualization.jl:272-299)."""
    plt = _plt()
    ts = np.asarray(ts)
    qs = np.asarray(qs)
    steps = np.arange(ts.shape[0])
    fig, axes = plt.subplots(2, 2)
    for d, name in enumerate("xyz"):
        ax = axes.flat[d]
        vals = ts[..., d].reshape(ts.shape[0], -1)
        ax.plot(steps, vals.mean(-1), lw=1)
        ax.fill_between(steps, vals.min(-1), vals.max(-1), alpha=0.3)
        if gt_t is not None:
            ax.axhline(np.asarray(gt_t)[d], color="k", ls="--", lw=0.8)
        ax.set_ylabel(f"t_{name} / m")
    ax = axes.flat[3]
    w = np.abs(qs[..., 0].reshape(qs.shape[0], -1))
    angle = 2 * np.degrees(np.arccos(np.clip(w, 0, 1)))
    ax.plot(steps, angle.mean(-1), lw=1)
    ax.set_ylabel("rotation angle / deg")
    ax.set_xlabel("step")
    return fig


def plot_pose_density(ts, bins=50, log_weights=None):
    """Translation marginals of the final particles
    (parity: plot_pose_density at Visualization.jl:249-270). For weighted SMC
    populations pass ``log_weights`` — the marginals are then the weighted
    posterior density, not the raw particle histogram."""
    plt = _plt()
    ts = np.asarray(ts).reshape(-1, 3)
    weights = None
    if log_weights is not None:
        lw = np.asarray(log_weights).reshape(-1)
        weights = np.exp(lw - lw.max())
        weights = weights / weights.sum()
    fig, axes = plt.subplots(1, 3)
    for d, name in enumerate("xyz"):
        axes[d].hist(ts[:, d], bins=bins, density=True, weights=weights)
        axes[d].set_xlabel(f"t_{name} / m")
    return fig


def plot_logprob(log_probs):
    """(parity: plot_logprob at Visualization.jl:301-307)"""
    plt = _plt()
    lp = np.asarray(log_probs)
    fig, ax = plt.subplots()
    if lp.ndim > 1:
        ax.plot(lp.max(-1), label="max")
        ax.plot(lp.mean(-1), label="mean")
        ax.legend()
    else:
        ax.plot(lp)
    ax.set_xlabel("step")
    ax.set_ylabel("log probability")
    return fig


def plot_logevidence(log_evidence):
    """Log-evidence trace — 'a pretty good convergence indicator'
    (parity: plot_logevidence at Visualization.jl:309-314,
    scripts/demo_inference.jl:131-133)."""
    plt = _plt()
    fig, ax = plt.subplots()
    ax.plot(np.asarray(log_evidence))
    ax.set_xlabel("step")
    ax.set_ylabel("log evidence")
    return fig


def plot_recall_curves(errors_by_label, theta_marker=None, theta_range=None, title=""):
    """Recall-over-threshold curves per sampler label
    (parity: evaluate_recalls figures at Evaluation.jl:275-314)."""
    plt = _plt()
    theta_range = np.linspace(0, 1, 51) if theta_range is None else theta_range
    fig, ax = plt.subplots()
    for label, errors in errors_by_label.items():
        errors = np.asarray(errors, float).ravel()
        recalls = [(errors < th).mean() if errors.size else 0.0 for th in theta_range]
        ax.plot(theta_range, recalls, label=label)
    if theta_marker is not None:
        ax.axvline(theta_marker, color="k", ls="--", lw=0.8)
    ax.set_xlabel("error threshold")
    ax.set_ylabel("recall")
    ax.set_ylim(0, 1)
    ax.set_title(title)
    ax.legend()
    return fig


def plot_recall_vs_visibility(visib_df, title="VSD recall vs visibility"):
    """Recall per visibility bin with CI error bars, one line per sampler.
    ``visib_df``: DataFrame with sampler, visib_lo, visib_hi, vsd_recall,
    ci_lo, ci_hi, n_gt (the recall_vs_visibility.csv schema)."""
    plt = _plt()
    fig, ax = plt.subplots()
    for label, grp in visib_df.groupby("sampler"):
        grp = grp.sort_values("visib_lo")
        x = (grp.visib_lo + grp.visib_hi) / 2
        # clip: CSVs written before recall_ci clamped the interval to contain
        # p-hat can carry ci_hi = recall - 2e-16 at full recall. Only float
        # dust may be clipped — a genuinely inconsistent CSV (interval that
        # excludes its own point estimate) must surface, not be zeroed.
        yerr = np.stack([grp.vsd_recall - grp.ci_lo,
                         grp.ci_hi - grp.vsd_recall])
        if (yerr < -1e-9).any():
            raise ValueError(
                f"recall_vs_visibility rows for {label!r} have CI bounds on "
                f"the wrong side of the point estimate (min margin "
                f"{yerr.min():.3g}); the CSV is inconsistent")
        yerr = np.clip(yerr, 0.0, None)
        ax.errorbar(x, grp.vsd_recall, yerr=yerr, marker="o", capsize=3,
                    label=label)
    ax.set_xlabel("visibility fraction")
    ax.set_ylabel("VSD recall")
    ax.set_ylim(0, 1.02)
    ax.set_title(title)
    ax.legend()
    return fig
