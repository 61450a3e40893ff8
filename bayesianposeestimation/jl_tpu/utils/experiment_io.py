"""Experiment-level I/O helpers: image+mesh loading, TUM trajectories, rosbags.

Parity targets: /root/reference/src/ExperimentUtils.jl — ``load_img_mesh``
(:27-32), ``load_tum`` (:47-57) — and the ROS ingestion of
/root/reference/src/ParticleFilter.jl:219-261 (``CvCamera(camera_info)``,
``ros_depth_img``, ``ros_pose``), which here reads pre-converted ``.npz``
depth streams (see ``convert_rosbag``) since live ROS is out of scope for a
TPU batch environment.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..camera import CvCamera
from . import bop
from .decimate import triangle_budget_for_resolution

__all__ = [
    "load_img_mesh",
    "load_tum",
    "save_tum",
    "camera_from_info",
    "ros_depth_img",
    "ros_pose",
    "load_depth_stream",
    "save_depth_stream",
    "convert_rosbag",
]


def load_img_mesh(row, params, decimate_mesh=True):
    """Depth image, visible mask, and (decimated) object mesh for a BOP target
    row (parity: load_img_mesh at ExperimentUtils.jl:27-32)."""
    depth_img = bop.load_depth_image(row, params.width, params.height)
    mask_img = bop.load_mask_image(row, params.width, params.height)
    budget = triangle_budget_for_resolution(params.width, params.height) if decimate_mesh else None
    mesh = bop.load_mesh(row, decimate_to=budget)
    return depth_img, mask_img, mesh


# --------------------------------------------------------------------------- #
# TUM trajectory format
# --------------------------------------------------------------------------- #


def load_tum(filename):
    """(timestamps, translations [N,3], quaternions [N,4] wxyz)
    (parity: load_tum at ExperimentUtils.jl:47-57; TUM stores xyzw)."""
    data = np.loadtxt(filename)
    data = np.atleast_2d(data)
    stamps = data[:, 0]
    t = data[:, 1:4]
    qx, qy, qz, qw = data[:, 4], data[:, 5], data[:, 6], data[:, 7]
    q = np.stack([qw, qx, qy, qz], axis=1)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return stamps, t, q


def save_tum(filename, stamps, ts, qs):
    """Inverse of load_tum (wxyz -> file xyzw)."""
    qs = np.asarray(qs)
    rows = np.column_stack([stamps, np.asarray(ts), qs[:, 1], qs[:, 2], qs[:, 3], qs[:, 0]])
    np.savetxt(filename, rows, fmt="%.9g")


# --------------------------------------------------------------------------- #
# ROS message equivalents (numpy records)
# --------------------------------------------------------------------------- #


def camera_from_info(camera_info: dict) -> CvCamera:
    """CvCamera from a sensor_msgs/CameraInfo-like dict with 'K', 'width',
    'height' (parity: SciGL.CvCamera(camera_info) at ParticleFilter.jl:219-229)."""
    K = np.asarray(camera_info["K"], float).ravel()
    return CvCamera(
        width=int(camera_info["width"]), height=int(camera_info["height"]),
        f_x=K[0], f_y=K[4], c_x=K[2], c_y=K[5], s=K[1],
    )


def ros_depth_img(msg: dict) -> np.ndarray:
    """Depth image in meters from an Image-like dict with 'encoding', 'data',
    'width', 'height' (parity: ros_depth_img at ParticleFilter.jl:235-245)."""
    w, h = int(msg["width"]), int(msg["height"])
    enc = msg["encoding"]
    raw = msg["data"]
    if enc == "16UC1":
        img = np.frombuffer(raw, np.uint16).astype(np.float32) / 1000.0
    elif enc == "32FC1":
        img = np.frombuffer(raw, np.float32)
    else:
        raise ValueError(f"unsupported encoding {enc}")
    return img.reshape(h, w)


def ros_pose(msg: dict):
    """(t [3], q [4] wxyz, normalized) from a PoseStamped-like dict
    (parity: ros_pose at ParticleFilter.jl:251-261)."""
    p = msg["position"]
    o = msg["orientation"]
    q = np.asarray([o["w"], o["x"], o["y"], o["z"]], float)
    q /= np.linalg.norm(q)
    return np.asarray([p["x"], p["y"], p["z"]], float), q


# --------------------------------------------------------------------------- #
# Depth streams (.npz) — the tracking input format
# --------------------------------------------------------------------------- #


def save_depth_stream(path, depth_imgs, camera: CvCamera, stamps=None,
                      gt_ts=None, gt_qs=None):
    """Write a depth stream: [F, H, W] float32 meters + intrinsics (+ optional
    ground-truth trajectory)."""
    data = dict(
        depth=np.asarray(depth_imgs, np.float32),
        K=np.asarray(camera.intrinsic_matrix(), np.float32),
        width=camera.width, height=camera.height,
    )
    if stamps is not None:
        data["stamps"] = np.asarray(stamps)
    if gt_ts is not None:
        data["gt_t"] = np.asarray(gt_ts, np.float32)
        data["gt_q"] = np.asarray(gt_qs, np.float32)
    np.savez_compressed(path, **data)


def load_depth_stream(path):
    """-> dict with depth [F,H,W], camera (CvCamera), optional stamps/gt."""
    with np.load(path) as f:
        K = f["K"]
        out = dict(
            depth=f["depth"],
            camera=CvCamera(width=int(f["width"]), height=int(f["height"]),
                            f_x=float(K[0, 0]), f_y=float(K[1, 1]),
                            c_x=float(K[0, 2]), c_y=float(K[1, 2]), s=float(K[0, 1])),
        )
        for k in ("stamps", "gt_t", "gt_q"):
            if k in f.files:
                out[k] = f[k]
    return out


def convert_rosbag(bag_path, out_path, depth_topic, camera_info_topic,
                   pose_topic=None):
    """Offline rosbag -> .npz depth-stream converter (replaces the reference's
    RobotOSData ingestion, /root/reference/src/ParticleFilter.jl:219-261).
    Uses the self-contained native ROS1 parser (utils.rosbag) — no ROS stack
    or optional packages needed."""
    from .rosbag import read_bag

    topics = {depth_topic, camera_info_topic}
    if pose_topic:
        topics.add(pose_topic)
    depths, stamps, gt_t, gt_q = [], [], [], []
    camera = None
    for topic, _msgtype, stamp_ns, msg in read_bag(bag_path, topics):
        if topic == camera_info_topic and camera is None:
            camera = camera_from_info(dict(K=np.asarray(msg["K"]),
                                           width=msg["width"], height=msg["height"]))
        elif topic == depth_topic:
            depths.append(ros_depth_img(msg))
            stamps.append(stamp_ns * 1e-9)
        elif pose_topic and topic == pose_topic:
            t, q = ros_pose(msg)
            gt_t.append(t)
            gt_q.append(q)
    assert camera is not None and depths, "bag missing camera info or depth images"
    save_depth_stream(out_path, np.stack(depths), camera, np.asarray(stamps),
                      np.asarray(gt_t) if gt_t else None,
                      np.asarray(gt_q) if gt_q else None)
    return out_path
