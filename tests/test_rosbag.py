"""Rosbag ingestion end-to-end: native ROS1 bag -> depth stream -> tracker.

Parity: /root/reference/src/ParticleFilter.jl:219-261 (CvCamera(camera_info),
ros_depth_img 16UC1/32FC1, ros_pose) and scripts/ros_particle_filter.jl:66-75
(bag -> stream -> particle filter). The bag is written AND read by the
self-contained utils.rosbag parser (no ROS stack in this image).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayesianposeestimation.jl_tpu import quaternions as quat
from bayesianposeestimation.jl_tpu.camera import CvCamera
from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth_batch
from bayesianposeestimation.jl_tpu.utils.experiment_io import (
    convert_rosbag,
    load_depth_stream,
)
from bayesianposeestimation.jl_tpu.utils.mesh_io import cube_mesh
from bayesianposeestimation.jl_tpu.utils.rosbag import read_bag, write_bag


W, H, F = 32, 24, 5
CAM = CvCamera(width=W, height=H, f_x=40.0, f_y=40.0, c_x=(W - 1) / 2,
               c_y=(H - 1) / 2, near=0.01, far=10.0)


def _make_bag(path, encoding="16UC1"):
    """Tiny bag: F depth frames of a cube drifting in x + camera info + gt."""
    mesh = cube_mesh(0.1)
    ts = np.stack([[0.01 * i, 0.0, 1.0] for i in range(F)]).astype(np.float32)
    qs = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (F, 1))
    depth = np.asarray(render_depth_batch(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces), CAM,
        jnp.asarray(ts), jnp.asarray(qs)))

    msgs = []
    K = np.asarray([[CAM.f_x, 0, CAM.c_x], [0, CAM.f_y, CAM.c_y], [0, 0, 1]])
    msgs.append(("/camera/info", "sensor_msgs/CameraInfo", 0,
                 dict(height=H, width=W, K=K.ravel())))
    for i in range(F):
        if encoding == "16UC1":
            raw = (depth[i] * 1000.0).astype("<u2").tobytes()
        else:
            raw = depth[i].astype("<f4").tobytes()
        stamp_ns = int(1e9 + i * 1e7)
        msgs.append(("/camera/depth", "sensor_msgs/Image", stamp_ns,
                     dict(height=H, width=W, encoding=encoding, data=raw,
                          header=dict(stamp=stamp_ns * 1e-9))))
        msgs.append(("/gt_pose", "geometry_msgs/PoseStamped", stamp_ns,
                     dict(position=dict(x=float(ts[i, 0]), y=float(ts[i, 1]),
                                        z=float(ts[i, 2])),
                          orientation=dict(x=0.0, y=0.0, z=0.0, w=1.0))))
    write_bag(path, msgs)
    return depth, ts


def test_bag_roundtrip(tmp_path):
    bag = tmp_path / "t.bag"
    depth, _ = _make_bag(bag)
    seen = list(read_bag(bag))
    topics = [t for t, *_ in seen]
    assert topics.count("/camera/depth") == F
    assert topics.count("/camera/info") == 1
    assert topics.count("/gt_pose") == F
    img_msgs = [m for t, ty, s, m in seen if ty == "sensor_msgs/Image"]
    assert img_msgs[0]["encoding"] == "16UC1"
    got = np.frombuffer(img_msgs[0]["data"], "<u2").reshape(H, W) / 1000.0
    np.testing.assert_allclose(got, depth[0], atol=1e-3)


def _record(header_fields: dict, data: bytes) -> bytes:
    """Spec-conformant bag record, built independently of utils.rosbag."""
    import struct

    h = b""
    for name, value in header_fields.items():
        item = name.encode() + b"=" + value
        h += struct.pack("<I", len(item)) + item
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def test_spec_conformant_time_field(tmp_path):
    """Bag 2.0 'time' header = secs(u32)+nsecs(u32) — fixed bytes, no writer.

    Guards against reading the field as a u64 nanosecond count (which would
    decode secs=7, nsecs=123 as 7 + 123<<32 ns). Spec:
    http://wiki.ros.org/Bags/Format/2.0.
    """
    import struct

    pose = (struct.pack("<III", 0, 7, 123) + struct.pack("<I", 0)  # ros header
            + struct.pack("<7d", 1.0, 2.0, 3.0, 0.0, 0.0, 0.0, 1.0))
    inner = b""
    for name, value in {"topic": b"/p",
                        "type": b"geometry_msgs/PoseStamped"}.items():
        item = name.encode() + b"=" + value
        inner += struct.pack("<I", len(item)) + item
    conn = _record({"op": b"\x07", "conn": struct.pack("<I", 0),
                    "topic": b"/p"}, inner)
    msg = _record({"op": b"\x02", "conn": struct.pack("<I", 0),
                   "time": struct.pack("<II", 7, 123)}, pose)
    bag = (b"#ROSBAG V2.0\n"
           + _record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                      "conn_count": struct.pack("<I", 1),
                      "chunk_count": struct.pack("<I", 1)}, b" " * 4096)
           + _record({"op": b"\x05", "compression": b"none",
                      "size": struct.pack("<I", len(conn + msg))}, conn + msg))
    path = tmp_path / "spec.bag"
    path.write_bytes(bag)
    [(topic, msgtype, stamp_ns, m)] = list(read_bag(path))
    assert topic == "/p" and msgtype == "geometry_msgs/PoseStamped"
    assert stamp_ns == 7 * 10**9 + 123
    assert m["position"] == dict(x=1.0, y=2.0, z=3.0)


def test_writer_time_field_is_spec_conformant(tmp_path):
    """Bytes written for 'time' must decode as secs(u32)+nsecs(u32)."""
    import struct

    path = tmp_path / "w.bag"
    stamp_ns = 5 * 10**9 + 42
    write_bag(path, [("/gt", "geometry_msgs/PoseStamped", stamp_ns,
                      dict(position=dict(x=0.0, y=0.0, z=0.0),
                           orientation=dict(x=0.0, y=0.0, z=0.0, w=1.0)))])
    raw = path.read_bytes()
    want = b"time=" + struct.pack("<II", 5, 42)
    assert want in raw, "writer must pack time as secs+nsecs u32 pair"


def test_unknown_chunk_compression_raises(tmp_path):
    import struct

    chunk = _record({"op": b"\x05", "compression": b"lz4",
                     "size": struct.pack("<I", 0)}, b"garbage")
    path = tmp_path / "lz4.bag"
    path.write_bytes(b"#ROSBAG V2.0\n" + chunk)
    with pytest.raises(ValueError, match="lz4"):
        list(read_bag(path))


@pytest.mark.parametrize("encoding", ["16UC1", "32FC1"])
def test_convert_rosbag_to_stream(tmp_path, encoding):
    bag = tmp_path / "t.bag"
    depth, ts = _make_bag(bag, encoding)
    out = convert_rosbag(bag, tmp_path / "stream.npz", "/camera/depth",
                         "/camera/info", "/gt_pose")
    stream = load_depth_stream(out)
    assert stream["depth"].shape == (F, H, W)
    atol = 1e-3 if encoding == "16UC1" else 1e-6
    np.testing.assert_allclose(stream["depth"], depth, atol=atol)
    assert stream["camera"].width == W and stream["camera"].f_x == CAM.f_x
    np.testing.assert_allclose(stream["gt_t"], ts, atol=1e-7)
    np.testing.assert_allclose(stream["gt_q"][:, 0], 1.0)


def test_bag_stream_drives_tracker(tmp_path, key):
    """Full chain: bag -> npz stream -> bootstrap PF tracks the drift."""
    from bayesianposeestimation.jl_tpu.models.particle_filter import (
        bootstrap_pf,
        fused_pf_posterior,
    )
    from bayesianposeestimation.jl_tpu.parameters import Experiment, Parameters

    bag = tmp_path / "t.bag"
    _make_bag(bag)
    out = convert_rosbag(bag, tmp_path / "stream.npz", "/camera/depth",
                         "/camera/info", "/gt_pose")
    stream = load_depth_stream(out)
    mesh = cube_mesh(0.1)
    params = Parameters(width=W, height=H, n_particles=32,
                        proposal_sigma_t=(0.01, 0.01, 0.01),
                        proposal_sigma_r=(0.05, 0.05, 0.05))
    scene = {"camera": stream["camera"], "verts": jnp.asarray(mesh.vertices),
             "faces": jnp.asarray(mesh.faces)}
    exp = Experiment(scene=scene, prior_o=params.o_mask_is,
                     prior_t=jnp.asarray(stream["gt_t"][0]),
                     depth_image=jnp.asarray(stream["depth"][0]))
    outs, final = bootstrap_pf(key, fused_pf_posterior("simple"), params, exp,
                               stream["depth"])
    w = np.exp(np.asarray(outs["log_weights"]))
    est_t = np.einsum("fn,fnd->fd", w, np.asarray(outs["t"]))
    err = np.linalg.norm(est_t - stream["gt_t"][1:], axis=1)
    assert np.isfinite(err).all()
    assert err.max() < 0.06, err
