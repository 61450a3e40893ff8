"""Offline trajectory evaluation: tracked TUM vs ground-truth TUM.

Parity target: the reference's PF workflow exports TUM trajectories for
offline comparison (/root/reference/src/ExperimentUtils.jl:47-57 load_tum;
/root/reference/scripts/rosbag/tf_bag.py exports gt TF to TUM). This script
closes the loop: per-frame translation/rotation error vs time, ATE (absolute
trajectory error, no alignment — object pose is absolute in the camera
frame), and RPE (relative pose error over a frame delta, isolating drift
from absolute offset).

    python scripts/ros_particle_filter.py --export-tum /tmp/track
    python scripts/trajectory_error.py /tmp/track.tum /tmp/track_gt.tum \
        --out-csv data/exp_pro/tracking/coordinate_traj.csv
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# pure-host math: honor an explicit JAX_PLATFORMS=cpu (the axon sitecustomize
# force-sets "axon,cpu", which would pointlessly wait on the TPU tunnel)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def associate(est_stamps, gt_stamps, max_dt=0.02):
    """Nearest-timestamp association (TUM-tools convention). Returns index
    pairs (i_est, i_gt)."""
    import numpy as np

    gt_idx = np.searchsorted(gt_stamps, est_stamps)
    gt_idx = np.clip(gt_idx, 1, len(gt_stamps) - 1)
    left = gt_idx - 1
    pick = np.where(np.abs(gt_stamps[gt_idx] - est_stamps)
                    < np.abs(gt_stamps[left] - est_stamps), gt_idx, left)
    ok = np.abs(gt_stamps[pick] - est_stamps) <= max_dt
    return np.nonzero(ok)[0], pick[ok]


def quat_angle(q1, q2):
    """Angular distance [rad] between quaternion arrays [N, 4] (wxyz),
    sign-invariant."""
    import numpy as np

    dot = np.abs(np.sum(q1 * q2, axis=1))
    return 2.0 * np.arccos(np.clip(dot, -1.0, 1.0))


def relative_errors(ts, qs, gt_t, gt_q, delta=1):
    """RPE: error of the frame-to-frame motion increment over ``delta``
    frames — drift per step, independent of absolute offset."""
    import numpy as np

    from bayesianposeestimation.jl_tpu import quaternions as quat
    import jax.numpy as jnp

    def rel(t, q):
        # increment i -> i+delta expressed in the earlier frame
        q0 = jnp.asarray(q[:-delta])
        q1 = jnp.asarray(q[delta:])
        dq = np.asarray(quat.qmul(quat.qconj(q0), q1))
        dt_ = np.asarray(quat.qrotate(
            quat.qconj(q0), jnp.asarray(t[delta:] - t[:-delta])))
        return dt_, dq

    dt_e, dq_e = rel(ts, qs)
    dt_g, dq_g = rel(gt_t, gt_q)
    trans = np.linalg.norm(dt_e - dt_g, axis=1)
    rot = quat_angle(dq_e / np.linalg.norm(dq_e, axis=1, keepdims=True),
                     dq_g / np.linalg.norm(dq_g, axis=1, keepdims=True))
    return trans, rot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("est_tum")
    ap.add_argument("gt_tum")
    ap.add_argument("--max-dt", type=float, default=0.02)
    ap.add_argument("--rpe-delta", type=int, default=1)
    ap.add_argument("--out-csv", default=None)
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    import numpy as np

    from bayesianposeestimation.jl_tpu.utils.experiment_io import load_tum

    est_stamps, est_t, est_q = load_tum(args.est_tum)
    gt_stamps, gt_t, gt_q = load_tum(args.gt_tum)
    ie, ig = associate(est_stamps, gt_stamps, args.max_dt)
    if len(ie) == 0:
        raise SystemExit("no timestamp associations within --max-dt")
    t_e, q_e = est_t[ie], est_q[ie]
    t_g, q_g = gt_t[ig], gt_q[ig]

    trans_err = np.linalg.norm(t_e - t_g, axis=1)
    rot_err = quat_angle(q_e, q_g)
    ate_rmse = float(np.sqrt(np.mean(trans_err**2)))
    rpe_t, rpe_r = relative_errors(t_e, q_e, t_g, q_g, args.rpe_delta)

    summary = {
        "n_frames": int(len(ie)),
        "ate_rmse_mm": round(ate_rmse * 1000, 2),
        "trans_median_mm": round(float(np.median(trans_err)) * 1000, 2),
        "trans_p95_mm": round(float(np.percentile(trans_err, 95)) * 1000, 2),
        "rot_median_deg": round(float(np.degrees(np.median(rot_err))), 2),
        "rot_p95_deg": round(float(np.degrees(np.percentile(rot_err, 95))), 2),
        "rpe_trans_median_mm": round(float(np.median(rpe_t)) * 1000, 2),
        "rpe_rot_median_deg": round(float(np.degrees(np.median(rpe_r))), 2),
    }
    print(json.dumps(summary))

    if args.out_csv:
        import pandas as pd

        Path(args.out_csv).parent.mkdir(parents=True, exist_ok=True)
        pd.DataFrame({
            "stamp": est_stamps[ie],
            "trans_err_mm": trans_err * 1000,
            "rot_err_deg": np.degrees(rot_err),
        }).to_csv(args.out_csv, index=False)
        print(f"wrote {args.out_csv}")
    if args.out_json:
        Path(args.out_json).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out_json).write_text(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
