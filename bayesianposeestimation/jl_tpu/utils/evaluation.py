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
    "vsd_errors_batch",
    "match_errors",
    "match_bop19_errors",
    "match_scene_errors",
    "threshold_errors",
    "recall",
    "recall_ci",
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


def adds_error(points, es_t, es_q, gt_t, gt_q, max_points=2048, chunk=4096):
    """ADD-S: mean nearest-neighbor distance between the estimate- and
    gt-transformed model point clouds (symmetric-friendly ADD).

    Reference-scale meshes carry 10^5+ vertices; the dense pairwise matrix
    is 10^10 floats there (the reference falls back to host KD-trees +
    ThreadsX, Evaluation.jl:9,207). TPU-native strategy instead:

    * ``max_points``: evenly-strided subsample of the model cloud before the
      pairwise min (BOP-toolkit style; deterministic). None = exact.
    * ``chunk``: when the (sub)cloud still exceeds this, the estimate axis is
      scanned in chunks with a running per-gt-point min, bounding memory at
      O(V * chunk) instead of O(V^2).
    """
    points = jnp.asarray(points)
    n = points.shape[0]
    if max_points is not None and n > max_points:
        idx = jnp.linspace(0, n - 1, max_points).astype(jnp.int32)
        points = points[idx]
        n = max_points
    pe = _transform(points, es_t, es_q)
    pg = _transform(points, gt_t, gt_q)
    if n <= chunk:
        d2 = jnp.sum((pg[:, None, :] - pe[None, :, :]) ** 2, axis=-1)
        return jnp.mean(jnp.sqrt(jnp.min(d2, axis=1)))
    n_chunks = -(-n // chunk)
    # pad with a far-away sentinel (min ignores it; inf-inf would NaN)
    pad = n_chunks * chunk - n
    pe_pad = jnp.concatenate([pe, jnp.full((pad, 3), 1e18, pe.dtype)])
    pe_chunks = pe_pad.reshape(n_chunks, chunk, 3)

    def body(best, pe_c):
        d2 = jnp.sum((pg[:, None, :] - pe_c[None, :, :]) ** 2, axis=-1)
        return jnp.minimum(best, jnp.min(d2, axis=1)), None

    best, _ = jax.lax.scan(body, jnp.full((n,), jnp.inf, pg.dtype), pe_chunks)
    return jnp.mean(jnp.sqrt(best))


def normalized_adds_error(points, es_t, es_q, gt_t, gt_q, diameter,
                          max_points=2048):
    """ADD-S / diameter (parity: normalized_adds_error at Evaluation.jl:27-38;
    correct if < ADDS_THETA = 0.1)."""
    return adds_error(points, es_t, es_q, gt_t, gt_q,
                      max_points=max_points) / diameter


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


@jax.jit
def _vsd_batch_impl(verts, faces, cam, scene_dist, es_t, es_q, gt_t, gt_q,
                    delta, taus_m):
    """All-estimates-vs-one-gt VSD in ONE compiled program: renders the
    N estimate poses + the gt pose in a single batched raster call and
    evaluates every τ. [N, T] errors for taus_m (absolute meters)."""
    poses_t = jnp.concatenate([es_t, gt_t[None]], axis=0)
    poses_q = jnp.concatenate([es_q, gt_q[None]], axis=0)
    depths = render_depth_batch(verts, faces, cam, poses_t, poses_q)
    dists = depth_to_distance(depths, cam)
    d_es, d_gt = dists[:-1], dists[-1]
    vis_gt = _visibility(d_gt, scene_dist, delta)
    vis_es = _visibility(d_es, scene_dist[None], delta)
    union = vis_es | vis_gt[None]
    n_union = jnp.sum(union, axis=(1, 2))
    both = vis_es & vis_gt[None]
    diff = jnp.abs(d_es - d_gt[None])
    ok = both[None] & (diff[None] < taus_m[:, None, None, None])
    err = 1.0 - jnp.sum(ok, axis=(2, 3)) / jnp.maximum(n_union[None], 1)
    return jnp.where(n_union[None] > 0, err, 1.0).T  # [N, T]


def vsd_errors_batch(scene, cam, scene_depth_img, es_ts, es_qs, gt_t, gt_q,
                     diameter, delta=BOP_DELTA, tau=0.02,
                     taus_bop=BOP19_THRESHOLDS):
    """BOP18 + BOP19 VSD of N estimates against one gt in one jitted call.

    Returns (vsd [N], vsdbop [N, n_tau]). This is the production eval path:
    the per-pair ``vsd_error`` wrapper re-traces eagerly (fine on CPU, ~ms
    per op through the TPU tunnel — minutes per image); here the renders and
    all τ thresholds fuse into one XLA program, compiled once per
    (mesh, crop) shape."""
    scene_z = jnp.asarray(scene_depth_img)
    scene_z = jnp.where(scene_z <= 0, jnp.inf, scene_z)
    scene_dist = depth_to_distance(scene_z, cam)
    taus_m = jnp.concatenate([
        jnp.asarray([tau], jnp.float32),
        jnp.asarray(taus_bop, jnp.float32) * jnp.float32(diameter)])
    errs = _vsd_batch_impl(
        scene["verts"], scene["faces"], cam, scene_dist,
        jnp.asarray(es_ts, jnp.float32), jnp.asarray(es_qs, jnp.float32),
        jnp.asarray(gt_t, jnp.float32), jnp.asarray(gt_q, jnp.float32),
        jnp.float32(delta), taus_m)
    return np.asarray(errs[:, 0]), np.asarray(errs[:, 1:])


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
        # an estimate with no finite error against any free gt must NOT
        # consume a gt slot (it can't be "the" estimate for that instance)
        if np.isfinite(cand[g]):
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
        if np.isfinite(cand[g]):
            out[g] = errors[e, g]
            taken_gt[g] = True
    return out


def match_scene_errors(result_rows, errors_fn, min_visib=0.1, gt_rows=None):
    """BOP-semantics evaluation: group estimates per (scene_id, img_id,
    obj_id), compute each estimate's error against EVERY ground-truth
    instance of that object in the image, drop gts with
    ``visib_fract < min_visib``, and greedily match estimates (best score
    first) to gts.

    Parity: /root/reference/src/Evaluation.jl:109-147 (match_obj_errors via
    outer join of estimates x gts) and :173-216 (gt set from
    gt_dataframe/gt_info_dataframe, visib_fract >= 0.1 filter,
    per-(scene,img,obj) grouping).

    ``result_rows``: dicts with scene_id, img_id, obj_id, gt_id, t, q, score,
    gt_t, gt_R, visib_fract (one row per estimate, carrying its target gt).
    ``gt_rows``: the ground-truth annotations (dicts with scene_id, img_id,
    obj_id, gt_id, gt_t, gt_R, visib_fract). When given, the recall
    denominator comes from THIS set — outer-join semantics: a gt with no
    estimate rows still counts as a failure (inf error), matching the
    reference's ``outerjoin(gt_df, est_df)``. When omitted, the gt set is
    reconstructed from the estimate rows (legacy behavior; inflates recall
    if inference ever skips an instance).
    ``errors_fn(est_rows, gt_group) -> dict`` with per-metric error matrices:
    'adds'/'vsd' [n_est, n_gt], 'vsdbop' [n_est, n_gt, n_tau].

    Returns dict of matched per-gt error arrays concatenated over groups
    (unmatched gts = inf — counted as failures in the recall).
    """
    groups: dict = {}
    for r in result_rows:
        groups.setdefault(
            (int(r["scene_id"]), int(r["img_id"]), int(r["obj_id"])), []
        ).append(r)

    if gt_rows is not None:
        gt_groups: dict = {}
        for g in gt_rows:
            gt_groups.setdefault(
                (int(g["scene_id"]), int(g["img_id"]), int(g["obj_id"])), {}
            ).setdefault(int(g["gt_id"]), g)
        # "Only estimates for which a ground truth exists are relevant"
        # (Evaluation.jl:199) — groups are enumerated from the gt set.
        group_keys = list(gt_groups)
    else:
        gt_groups = {k: {int(r["gt_id"]): r for r in ests}
                     for k, ests in groups.items()}
        group_keys = list(groups)

    n_tau = len(BOP19_THRESHOLDS)
    out = {"adds": [], "vsd": [], "vsdbop": []}
    visib = []  # per-gt visib_fract, aligned with the matched error arrays
    unmatched = []  # (n_gt, visibs) for gt groups without any estimate
    for key in group_keys:
        gt_group = [g for g in gt_groups[key].values()
                    if float(g.get("visib_fract", 1.0)) >= min_visib]
        if not gt_group:
            continue
        gt_visibs = [float(g.get("visib_fract", 1.0)) for g in gt_group]
        ests = groups.get(key, [])
        if not ests:
            # no estimate at all for this group: every gt is a failure.
            # Deferred so the inf rows are appended only for the metrics
            # errors_fn actually produces (a partial errors_fn would
            # otherwise get phantom rows in the other metrics' arrays).
            unmatched.append(gt_visibs)
            continue
        errs = errors_fn(ests, gt_group)
        scores = [float(r["score"]) for r in ests]
        if "adds" in errs:
            out["adds"].append(match_errors(scores, errs["adds"]))
        if "vsd" in errs:
            out["vsd"].append(match_errors(scores, errs["vsd"]))
        if "vsdbop" in errs:
            out["vsdbop"].append(match_bop19_errors(scores, errs["vsdbop"]))
        visib.append(np.asarray(gt_visibs))
    n_tau = len(BOP19_THRESHOLDS)
    active = [m for m in out if out[m]] or list(out)
    for gt_visibs in unmatched:
        n_gt = len(gt_visibs)
        # pad every ACTIVE metric (all three when no group had estimates)
        if "adds" in active:
            out["adds"].append(np.full(n_gt, np.inf))
        if "vsd" in active:
            out["vsd"].append(np.full(n_gt, np.inf))
        if "vsdbop" in active:
            out["vsdbop"].append(np.full((n_gt, n_tau), np.inf))
        visib.append(np.asarray(gt_visibs))
    return {
        "adds": np.concatenate(out["adds"]) if out["adds"] else np.zeros(0),
        "vsd": np.concatenate(out["vsd"]) if out["vsd"] else np.zeros(0),
        "vsdbop": (np.concatenate(out["vsdbop"])
                   if out["vsdbop"] else np.zeros((0, n_tau))),
        "visib": np.concatenate(visib) if visib else np.zeros(0),
    }


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


def recall_ci(n_correct, n_total, z=1.96):
    """Wilson score interval (lo, hi) for a binomial recall at ~95%.

    The reference reports point recalls only; with the synthetic sets'
    O(10^2) gt instances the interval is the honest part of the number
    (VERDICT r3 missing #3: 0.853 vs 0.824 over 68 gts is 2 instances,
    not a finding). Wilson rather than normal approximation: recalls sit
    near 1.0 where the Wald interval degenerates."""
    if not n_total:
        return 0.0, 0.0
    p = n_correct / n_total
    denom = 1.0 + z * z / n_total
    center = (p + z * z / (2 * n_total)) / denom
    half = (z / denom) * np.sqrt(p * (1 - p) / n_total
                                 + z * z / (4 * n_total * n_total))
    # the exact Wilson interval contains p-hat (with equality at p in {0,1});
    # enforce that through float rounding so ci_hi >= recall always holds
    # (at p=1, center+half computes to 1-2e-16 and error-bar code downstream
    # would see a negative upper bar)
    return max(0.0, min(p, center - half)), min(1.0, max(p, center + half))


# --------------------------------------------------------------------------- #
# Step-time calibration (time budget -> n_steps)
# --------------------------------------------------------------------------- #


def mean_step_time(key, model, sampler, n_particles=None, max_seconds=0.5,
                   steps_per_probe=(8, 48), return_overhead=False):
    """Mean wall time of one compiled sampler step.

    Parity: mean_step_time at Evaluation.jl:238-244 — used to convert the
    per-pose time budget into a step count. Compile time is excluded (the
    reference's BenchmarkTools likewise ignores the first evaluation).

    The production chain is ONE lax.scan, so the per-step cost to calibrate
    against excludes the per-dispatch overhead (several ms through the TPU
    tunnel). Timing two scan lengths and differencing cancels that constant
    exactly: t_step = (T(n_long) - T(n_short)) / (n_long - n_short).
    """
    n_short, n_long = steps_per_probe
    k_init, k_step = jax.random.split(key)
    _, state = jax.jit(lambda k: sampler.init(k, model, n_particles))(k_init)

    def make_probe(n):
        @jax.jit
        def probe(k, state):
            def body(s, kk):
                return sampler.step(kk, model, s)[1], None

            out, _ = jax.lax.scan(body, state, jax.random.split(k, n))
            return out

        return probe

    probes = {n: make_probe(n) for n in (n_short, n_long)}
    mins = {}
    means = {}
    for n, probe in probes.items():
        jax.block_until_ready(probe(k_step, state))  # compile
        t_end = time.perf_counter() + max_seconds / 2
        times = []
        while time.perf_counter() < t_end and len(times) < 20:
            t0 = time.perf_counter()
            jax.block_until_ready(probe(k_step, state))
            times.append(time.perf_counter() - t0)
        mins[n] = min(times)
        means[n] = float(np.mean(times))
    t_step = (mins[n_long] - mins[n_short]) / (n_long - n_short)
    # guard: interference can make the difference non-positive; fall back to
    # the long-probe average (conservative: overestimates the step time)
    if not np.isfinite(t_step) or t_step <= 0:
        t_step = mins[n_long] / n_long
    # Tunnel jitter on min-over-reps is O(ms); when the differenced work is
    # comparable, the slope can be off by orders of magnitude in EITHER
    # direction (one measured run budgeted 445k steps against a 0.5 s
    # budget from a ~0 diff). Re-probe with a length that puts >= ~50 ms of
    # step work in the difference — the 200-vs-2000-repeat rule the kernel
    # profiler uses, scaled adaptively so slow configs don't over-run.
    if (mins[n_long] - mins[n_short]) < 0.02:
        n2 = int(np.clip(0.05 / max(t_step, 1e-7), 2 * n_long, 4096))
        probe2 = make_probe(n2)
        jax.block_until_ready(probe2(k_step, state))
        t_end = time.perf_counter() + max_seconds / 2
        best2 = np.inf
        reps = 0
        while time.perf_counter() < t_end and reps < 20:
            t0 = time.perf_counter()
            jax.block_until_ready(probe2(k_step, state))
            best2 = min(best2, time.perf_counter() - t0)
            reps += 1
        slope = (best2 - mins[n_long]) / (n2 - n_long)
        if np.isfinite(slope) and slope > 0:
            t_step = slope
    # Overhead from the MEAN of the short-probe reps, not the min: the
    # realized run pays average dispatch cost including the ~30 ms tunnel
    # interference tails, and a min-based overhead under-budgets short
    # (0.05 s) pose budgets by exactly those tails (r4 overshoot fix).
    overhead = max(means[n_short] - n_short * t_step, 0.0)
    if return_overhead:
        return float(t_step), float(overhead)
    return float(t_step)


def steps_for_time_budget(step_time, time_budget, minimum=2, overhead=0.0,
                          safety=0.92):
    """n_steps = floor(safety * (budget - overhead) / step_time), floored at 2
    (parity: scripts/smc_bop_val.jl:135-140). ``overhead``: fixed per-call
    cost (dispatch/transfer) excluded from the step budget. ``safety``
    absorbs run-to-run step-time variance (TPU-tunnel jitter; single-chain
    MCMC steps vary more than the min-over-reps calibration sees — an r2
    mh_sampler run recorded 0.531 s against a 0.5 s budget) so the realized
    wall time stays <= budget."""
    budget = max(time_budget - overhead, 0.0) * safety
    return max(int(budget / step_time), minimum)
