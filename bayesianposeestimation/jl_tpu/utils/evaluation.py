"""BOP pose-error metrics, greedy matching, recall, and step-time calibration.

Parity targets:
* /root/reference/src/Evaluation.jl — ``adds_row`` (:27-38), ``vsd_row``
  BOP18 (:45-60), ``vsd_depth_row`` (:62-76), ``vsdbop_row`` BOP19 multi-τ
  (:85-100), greedy matching ``match_obj_errors`` (:109-147), recall
  aggregation (:246-328), ``mean_step_time`` (:238-244).
* PoseErrors.jl surface (SURVEY.md §2B): ``normalized_adds_error``,
  ``vsd_error``, ``normalized_vsd_error``, ``match_errors``,
  ``match_bop19_errors``, ``threshold_errors``, ``recall`` and the constants
  ``ADDS_θ``, ``BOP18_θ``, ``BOP19_THRESHOLDS``, ``BOP_δ``, ``ITODD_δ``.

TPU-native notes: ADD-S is a brute-force pairwise min on device (vmap-able
over estimates — the reference needed host ThreadsX + KD-trees,
Evaluation.jl:9,207); VSD re-uses the batched rasterizer so *all* estimates
of an image render in one call.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import depth_to_distance
from ..ops.rasterize import render_depth_batch
from .. import quaternions as quat

__all__ = [
    "ADDS_THETA",
    "BOP18_THETA",
    "BOP19_THRESHOLDS",
    "BOP_DELTA",
    "ITODD_DELTA",
    "adds_error",
    "normalized_adds_error",
    "vsd_error",
    "normalized_vsd_error",
    "match_errors",
    "match_bop19_errors",
    "threshold_errors",
    "recall",
    "mean_step_time",
    "steps_for_time_budget",
]

# BOP constants (PoseErrors parity)
ADDS_THETA = 0.1
BOP18_THETA = 0.3
BOP19_THRESHOLDS = tuple(np.arange(0.05, 0.501, 0.05))
BOP_DELTA = 0.015  # 15 mm visibility tolerance
ITODD_DELTA = 0.005  # 5 mm for ITODD/Steri (Evaluation.jl:196)


def _transform(points, t, q):
    return quat.qrotate(jnp.asarray(q), jnp.asarray(points)) + jnp.asarray(t)


def adds_error(points, es_t, es_q, gt_t, gt_q):
    """ADD-S: mean nearest-neighbor distance between the estimate- and
    gt-transformed model point clouds (symmetric-friendly ADD)."""
    pe = _transform(points, es_t, es_q)
    pg = _transform(points, gt_t, gt_q)
    d2 = jnp.sum((pg[:, None, :] - pe[None, :, :]) ** 2, axis=-1)
    return jnp.mean(jnp.sqrt(jnp.min(d2, axis=1)))


def normalized_adds_error(points, es_t, es_q, gt_t, gt_q, diameter):
    """ADD-S / diameter (parity: normalized_adds_error at Evaluation.jl:27-38;
    correct if < ADDS_THETA = 0.1)."""
    return adds_error(points, es_t, es_q, gt_t, gt_q) / diameter


def _visibility(render_d, scene_dist, delta):
    """Visibility mask: rendered surface not occluded beyond delta by the
    observed scene (BOP visib definition). Invalid scene pixels count as
    visible (no evidence of occlusion)."""
    rendered = render_d > 0
    occluded = jnp.isfinite(scene_dist) & (render_d > scene_dist + delta)
    return rendered & ~occluded


def vsd_error(scene, cam, scene_depth_img, es_t, es_q, gt_t, gt_q,
              delta=BOP_DELTA, tau=0.02, diameter=None, normalized=False):
    """Visible Surface Discrepancy.

    BOP18 (``normalized=False``): single absolute misalignment tolerance τ
    (meters); correct if error < BOP18_THETA.
    BOP19 (``normalized=True``): τ given as fraction(s) of ``diameter``;
    returns one error per τ (parity: vsdbop_row at Evaluation.jl:85-100).

    ``scene_depth_img``: observed depth (invalid = inf/0) used for the
    visibility masks, converted to a distance image internally (BOP18 uses
    distance images, Evaluation.jl:56-58).
    """
    verts, faces = scene["verts"], scene["faces"]
    both = render_depth_batch(
        verts, faces, cam,
        jnp.stack([jnp.asarray(es_t), jnp.asarray(gt_t)]),
        jnp.stack([jnp.asarray(es_q), jnp.asarray(gt_q)]),
    )
    d_es = depth_to_distance(both[0], cam)
    d_gt = depth_to_distance(both[1], cam)
    scene_z = jnp.asarray(scene_depth_img)
    scene_z = jnp.where(scene_z <= 0, jnp.inf, scene_z)
    scene_dist = depth_to_distance(scene_z, cam)

    vis_es = _visibility(d_es, scene_dist, delta)
    vis_gt = _visibility(d_gt, scene_dist, delta)
    union = vis_es | vis_gt
    n_union = jnp.sum(union)

    diff = jnp.abs(d_es - d_gt)
    both_vis = vis_es & vis_gt

    taus = jnp.atleast_1d(jnp.asarray(tau, jnp.float32))
    if normalized:
        taus = taus * diameter

    def err_for(tau_m):
        ok = both_vis & (diff < tau_m)
        return jnp.where(n_union > 0, 1.0 - jnp.sum(ok) / n_union, 1.0)

    errs = jax.vmap(err_for)(taus)
    return errs if jnp.ndim(tau) or normalized else errs[0]


def normalized_vsd_error(scene, cam, scene_depth_img, es_t, es_q, gt_t, gt_q,
                         diameter, delta=BOP_DELTA, tau=BOP19_THRESHOLDS):
    """BOP19 VSD: errors for τ ∈ tau · diameter (parity: Evaluation.jl:85-100)."""
    return vsd_error(scene, cam, scene_depth_img, es_t, es_q, gt_t, gt_q,
                     delta=delta, tau=np.asarray(tau, np.float32),
                     diameter=diameter, normalized=True)


# --------------------------------------------------------------------------- #
# Greedy matching + recall (host-side, tiny)
# --------------------------------------------------------------------------- #


def match_errors(scores, errors_per_estimate):
    """Greedily match estimates (best score first) to ground truths.

    ``errors_per_estimate``: [n_est, n_gt] error of each estimate against
    each gt. Returns [n_gt] matched errors; unmatched gts get inf
    (parity: PoseErrors.match_errors via Evaluation.jl:109-147).
    """
    errors = np.asarray(errors_per_estimate, float)
    n_est, n_gt = errors.shape
    out = np.full(n_gt, np.inf)
    taken_gt = np.zeros(n_gt, bool)
    order = np.argsort(-np.asarray(scores, float))
    for e in order:
        free = ~taken_gt
        if not free.any():
            break
        cand = np.where(free, errors[e], np.inf)
        g = int(np.argmin(cand))
        if np.isfinite(cand[g]) or free[g]:
            out[g] = errors[e, g]
            taken_gt[g] = True
    return out


def match_bop19_errors(scores, errors_per_estimate):
    """Greedy matching for per-τ error vectors: [n_est, n_gt, n_tau] ->
    [n_gt, n_tau] using the mean over τ for the assignment
    (parity: PoseErrors.match_bop19_errors)."""
    errors = np.asarray(errors_per_estimate, float)
    mean_err = errors.mean(axis=-1)
    n_est, n_gt, n_tau = errors.shape
    out = np.full((n_gt, n_tau), np.inf)
    taken_gt = np.zeros(n_gt, bool)
    order = np.argsort(-np.asarray(scores, float))
    for e in order:
        free = ~taken_gt
        if not free.any():
            break
        cand = np.where(free, mean_err[e], np.inf)
        g = int(np.argmin(cand))
        out[g] = errors[e, g]
        taken_gt[g] = True
    return out


def threshold_errors(errors, theta):
    """(n_correct, n_total) for error < θ; θ may be a vector (BOP19 τ grid)
    (parity: PoseErrors.threshold_errors)."""
    errors = np.asarray(errors, float)
    theta = np.asarray(theta, float)
    if theta.ndim == 0:
        return int(np.sum(errors < theta)), errors.size
    # per-τ thresholds: errors [..., n_tau]
    correct = int(np.sum(errors < theta.reshape((1,) * (errors.ndim - 1) + (-1,))))
    return correct, errors.size


def recall(n_correct, n_total):
    """(parity: PoseErrors.recall)"""
    return n_correct / n_total if n_total else 0.0


# --------------------------------------------------------------------------- #
# Step-time calibration (time budget -> n_steps)
# --------------------------------------------------------------------------- #


def mean_step_time(key, model, sampler, n_particles=None, max_seconds=0.5,
                   steps_per_probe=10):
    """Mean wall time of one compiled sampler step.

    Parity: mean_step_time at Evaluation.jl:238-244 — used to convert the
    per-pose time budget into a step count. Compile time is excluded (the
    reference's BenchmarkTools likewise ignores the first evaluation).
    Steps are timed inside a lax.scan of ``steps_per_probe`` so per-dispatch
    overhead (large on tunneled TPUs) does not inflate the estimate — the
    production chain is scanned the same way.
    """
    k_init, k_step = jax.random.split(key)
    _, state = jax.jit(lambda k: sampler.init(k, model, n_particles))(k_init)

    @jax.jit
    def probe(k, state):
        def body(s, kk):
            return sampler.step(kk, model, s)[1], None

        out, _ = jax.lax.scan(body, state, jax.random.split(k, steps_per_probe))
        return out

    jax.block_until_ready(probe(k_step, state))  # compile
    t_end = time.perf_counter() + max_seconds
    times = []
    while time.perf_counter() < t_end and len(times) < 20:
        t0 = time.perf_counter()
        jax.block_until_ready(probe(k_step, state))
        times.append((time.perf_counter() - t0) / steps_per_probe)
    return float(np.min(times))


def steps_for_time_budget(step_time, time_budget, minimum=2):
    """n_steps = floor(budget / step_time), floored at 2
    (parity: scripts/smc_bop_val.jl:135-140)."""
    return max(int(time_budget / step_time), minimum)
