"""Author spec-conformant golden fixture bytes for the parser tests.

Every byte here is constructed from the PUBLIC format specifications —
PLY (Turk's spec), the BOP-toolkit dataset format
(scene_camera/scene_gt/scene_gt_info/test_targets_bop19 JSONs, uint16 depth
PNGs), and the ROS1 bag v2.0 format (wiki.ros.org/Bags/Format/2.0) — NOT via
this repo's writers. Round-2 postmortem: readers that are only ever fed by
this repo's own writers cannot catch spec deviations (the bag 'time' field
bug class). Run once to (re)generate tests/fixtures/**; outputs are
deterministic and checked in.
"""

import bz2
import json
import struct
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent


# --------------------------------------------------------------------------- #
# PLY flavors
# --------------------------------------------------------------------------- #

# A unit-ish tetrahedron in millimeters (BOP models are mm).
TET_VERTS_MM = np.array(
    [[0.0, 0.0, 0.0], [100.0, 0.0, 0.0], [0.0, 100.0, 0.0], [0.0, 0.0, 100.0]],
    np.float32)
TET_TRIS = [[0, 2, 1], [0, 1, 3]]


def ply_bop_toolkit_flavor(path: Path):
    """binary_little_endian, vertices with normals + uchar RGB, faces with
    'property list uchar int vertex_indices' — the BOP-toolkit export shape."""
    header = "\n".join([
        "ply",
        "format binary_little_endian 1.0",
        "comment authored from the PLY spec for parser conformance tests",
        "element vertex 4",
        "property float x",
        "property float y",
        "property float z",
        "property float nx",
        "property float ny",
        "property float nz",
        "property uchar red",
        "property uchar green",
        "property uchar blue",
        "element face 2",
        "property list uchar int vertex_indices",
        "end_header",
    ]) + "\n"
    body = b""
    normals = np.array([[0, 0, 1]] * 4, np.float32)
    for v, n in zip(TET_VERTS_MM, normals):
        body += struct.pack("<6f", *v, *n) + struct.pack("<3B", 200, 10, 10)
    for tri in TET_TRIS:
        body += struct.pack("<B3i", 3, *tri)
    path.write_bytes(header.encode("ascii") + body)


def ply_int_count_flavor(path: Path):
    """binary_little_endian with 'property list int int' face counts — a
    legal flavor some exporters emit; assuming uchar counts misparses it."""
    header = "\n".join([
        "ply",
        "format binary_little_endian 1.0",
        "element vertex 4",
        "property float x",
        "property float y",
        "property float z",
        "element face 2",
        "property list int int vertex_indices",
        "end_header",
    ]) + "\n"
    body = b""
    for v in TET_VERTS_MM:
        body += struct.pack("<3f", *v)
    for tri in TET_TRIS:
        body += struct.pack("<i3i", 3, *tri)
    path.write_bytes(header.encode("ascii") + body)


def ply_ascii_quad_flavor(path: Path):
    """ascii with comments, per-vertex normals, and a QUAD face that must be
    fan-triangulated."""
    lines = [
        "ply",
        "format ascii 1.0",
        "comment a unit quad in mm, one 4-gon face",
        "element vertex 4",
        "property float x",
        "property float y",
        "property float z",
        "property float nx",
        "property float ny",
        "property float nz",
        "element face 1",
        "property list uchar int vertex_indices",
        "end_header",
        "0 0 0 0 0 1",
        "100 0 0 0 0 1",
        "100 100 0 0 0 1",
        "0 100 0 0 0 1",
        "4 0 1 2 3",
    ]
    path.write_text("\n".join(lines) + "\n")


def ply_big_endian_flavor(path: Path):
    """binary_big_endian — legal PLY, unsupported here; readers must refuse
    loudly instead of silently byte-swapping garbage."""
    header = "\n".join([
        "ply",
        "format binary_big_endian 1.0",
        "element vertex 1",
        "property float x",
        "property float y",
        "property float z",
        "element face 0",
        "property list uchar int vertex_indices",
        "end_header",
    ]) + "\n"
    path.write_bytes(header.encode("ascii") + struct.pack(">3f", 1.0, 2.0, 3.0))


def ply_mixed_quad_binary(path: Path):
    """binary LE where face 0 is a triangle and face 1 a quad — defeats the
    fixed-record fast path, exercising the mixed-polygon slow path."""
    header = "\n".join([
        "ply",
        "format binary_little_endian 1.0",
        "element vertex 5",
        "property float x",
        "property float y",
        "property float z",
        "element face 2",
        "property list uchar int vertex_indices",
        "end_header",
    ]) + "\n"
    verts = np.array([[0, 0, 0], [100, 0, 0], [100, 100, 0], [0, 100, 0],
                      [0, 0, 100]], np.float32)
    body = b"".join(struct.pack("<3f", *v) for v in verts)
    body += struct.pack("<B3i", 3, 0, 1, 4)
    body += struct.pack("<B4i", 4, 0, 1, 2, 3)
    path.write_bytes(header.encode("ascii") + body)


# --------------------------------------------------------------------------- #
# BOP dataset tree (T-LESS/ITODD-style: depth_scale 0.1, w2c keys present)
# --------------------------------------------------------------------------- #


def _write_png_u16(path: Path, arr: np.ndarray):
    import imageio.v3 as iio

    iio.imwrite(path, arr.astype(np.uint16))


def _write_png_u8(path: Path, arr: np.ndarray):
    import imageio.v3 as iio

    iio.imwrite(path, arr.astype(np.uint8))


def bop_tree(root: Path):
    ds = root / "specfix"  # dataset name
    val = ds / "val"
    scene = val / "000001"
    (scene / "depth").mkdir(parents=True, exist_ok=True)
    (scene / "mask_visib").mkdir(exist_ok=True)
    (ds / "models").mkdir(parents=True, exist_ok=True)

    K = [572.4114, 0.0, 325.2611, 0.0, 573.57043, 242.04899, 0.0, 0.0, 1.0]
    # scene_camera.json — includes world-to-cam keys and depth_scale 0.1
    # (ITODD/T-LESS flavor); readers must tolerate the extra keys.
    scene_camera = {
        "0": {
            "cam_K": K,
            "depth_scale": 0.1,
            "cam_R_w2c": [1, 0, 0, 0, 1, 0, 0, 0, 1],
            "cam_t_w2c": [0.0, 0.0, 0.0],
            "elev": 45,
            "mode": 0,
        },
        "1": {"cam_K": K, "depth_scale": 0.1},
    }
    (scene / "scene_camera.json").write_text(json.dumps(scene_camera))

    R_id = [1, 0, 0, 0, 1, 0, 0, 0, 1]
    R_zflip = [-1, 0, 0, 0, -1, 0, 0, 0, 1]
    scene_gt = {
        "0": [
            {"cam_R_m2c": R_id, "cam_t_m2c": [10.0, -20.0, 1000.0], "obj_id": 1},
            {"cam_R_m2c": R_zflip, "cam_t_m2c": [-30.0, 40.0, 1200.0], "obj_id": 2},
        ],
        "1": [
            {"cam_R_m2c": R_id, "cam_t_m2c": [0.0, 0.0, 900.0], "obj_id": 1},
        ],
    }
    (scene / "scene_gt.json").write_text(json.dumps(scene_gt))

    scene_gt_info = {
        "0": [
            {"bbox_obj": [100, 100, 50, 60], "bbox_visib": [100, 100, 45, 50],
             "px_count_all": 3000, "px_count_valid": 3000, "px_count_visib": 2400,
             "visib_fract": 0.8},
            {"bbox_obj": [300, 200, 40, 40], "bbox_visib": [300, 200, 10, 40],
             "px_count_all": 1600, "px_count_valid": 1600, "px_count_visib": 400,
             "visib_fract": 0.25},
        ],
        "1": [
            {"bbox_obj": [200, 150, 80, 80], "bbox_visib": [200, 150, 80, 80],
             "px_count_all": 6400, "px_count_valid": 6400, "px_count_visib": 6400,
             "visib_fract": 1.0},
        ],
    }
    (scene / "scene_gt_info.json").write_text(json.dumps(scene_gt_info))

    # depth: uint16, meters = raw * depth_scale * 1e-3. A 8x8 ramp with a
    # 0-valued (invalid) top-left pixel.
    depth0 = (np.arange(64, dtype=np.uint16).reshape(8, 8) + 1) * 1000
    depth0[0, 0] = 0
    _write_png_u16(scene / "depth" / "000000.png", depth0)
    _write_png_u16(scene / "depth" / "000001.png", np.full((8, 8), 9000, np.uint16))

    mask0 = np.zeros((8, 8), np.uint8)
    mask0[2:6, 2:6] = 255
    _write_png_u8(scene / "mask_visib" / "000000_000000.png", mask0)
    mask1 = np.zeros((8, 8), np.uint8)
    mask1[0:2, 6:8] = 255
    _write_png_u8(scene / "mask_visib" / "000000_000001.png", mask1)
    _write_png_u8(scene / "mask_visib" / "000001_000000.png", mask0.T.copy())

    # test_targets_bop19.json at the dataset root (BOP layout), with the
    # spec's inst_count field; only (im 0, obj 1) and (im 1, obj 1) listed —
    # obj 2 in image 0 must be filtered out by test_targets().
    targets = [
        {"im_id": 0, "inst_count": 1, "obj_id": 1, "scene_id": 1},
        {"im_id": 1, "inst_count": 1, "obj_id": 1, "scene_id": 1},
        {"im_id": 0, "inst_count": 1, "obj_id": 7, "scene_id": 99},
    ]
    (ds / "test_targets_bop19.json").write_text(json.dumps(targets))

    models_info = {
        "1": {"diameter": 173.2051, "min_x": 0.0, "min_y": 0.0, "min_z": 0.0,
              "size_x": 100.0, "size_y": 100.0, "size_z": 100.0},
        "2": {"diameter": 141.4214, "min_x": 0.0, "min_y": 0.0, "min_z": 0.0,
              "size_x": 100.0, "size_y": 100.0, "size_z": 0.0},
    }
    (ds / "models" / "models_info.json").write_text(json.dumps(models_info))
    ply_bop_toolkit_flavor(ds / "models" / "obj_000001.ply")
    ply_int_count_flavor(ds / "models" / "obj_000002.ply")


# --------------------------------------------------------------------------- #
# ROS1 bag v2.0, hand-built per the spec (wiki.ros.org/Bags/Format/2.0)
# --------------------------------------------------------------------------- #


def _field(name: str, value: bytes) -> bytes:
    item = name.encode() + b"=" + value
    return struct.pack("<I", len(item)) + item


def _record(fields: list, data: bytes) -> bytes:
    h = b"".join(_field(n, v) for n, v in fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _ros_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ros_std_header(seq: int, secs: int, nsecs: int, frame_id: str) -> bytes:
    return struct.pack("<III", seq, secs, nsecs) + _ros_string(frame_id)


def rosbag_fixture(path: Path):
    """A bz2-chunked bag with Image, CameraInfo and PoseStamped messages,
    index/chunk-info records the reader must skip, connection headers whose
    topic lives only in the CONNECTION DATA (the spec allows the record
    header's topic to be dropped/overridden), and a latching field."""
    # --- connection data headers (spec: topic,type,md5sum,message_definition
    # [+callerid,latching]) ---
    conn0_data = (_field("topic", b"/camera/depth/image_rect")
                  + _field("type", b"sensor_msgs/Image")
                  + _field("md5sum", b"060021388200f6f0f447d0fcd9c64743")
                  + _field("message_definition", b"std_msgs/Header header\n...")
                  + _field("callerid", b"/camera/driver")
                  + _field("latching", b"0"))
    conn1_data = (_field("topic", b"/tf_gt_pose")
                  + _field("type", b"geometry_msgs/PoseStamped")
                  + _field("md5sum", b"d3812c3cbc69362b77dc0b19b345f8f5")
                  + _field("message_definition", b"..."))
    conn2_data = (_field("topic", b"/camera/depth/camera_info")
                  + _field("type", b"sensor_msgs/CameraInfo")
                  + _field("md5sum", b"c9a58c1b0b154e0e6da7578cb991d214")
                  + _field("message_definition", b"...")
                  + _field("latching", b"1"))

    # record-header topic present for conn 0/2, ABSENT for conn 1 (readers
    # must fall back to the connection-data topic)
    conn0 = _record([("op", b"\x07"), ("conn", struct.pack("<I", 0)),
                     ("topic", b"/camera/depth/image_rect")], conn0_data)
    conn1 = _record([("op", b"\x07"), ("conn", struct.pack("<I", 1))], conn1_data)
    conn2 = _record([("op", b"\x07"), ("conn", struct.pack("<I", 2)),
                     ("topic", b"/camera/depth/camera_info")], conn2_data)

    # --- messages ---
    # 2x2 16UC1 image, row step 4, pixel values mm
    img_payload = (_ros_std_header(7, 1700000000, 250000000, "camera_depth_frame")
                   + struct.pack("<II", 2, 2)          # height, width
                   + _ros_string("16UC1")
                   + struct.pack("<B", 0)               # is_bigendian
                   + struct.pack("<I", 4)               # step
                   + struct.pack("<I", 8)
                   + struct.pack("<4H", 500, 600, 700, 800))
    msg_img = _record([("op", b"\x02"), ("conn", struct.pack("<I", 0)),
                       ("time", struct.pack("<II", 1700000000, 250000000))],
                      img_payload)

    K = [525.0, 0.0, 319.5, 0.0, 525.0, 239.5, 0.0, 0.0, 1.0]
    caminfo_payload = (_ros_std_header(7, 1700000000, 250000000, "camera_depth_frame")
                       + struct.pack("<II", 480, 640)
                       + _ros_string("plumb_bob")
                       + struct.pack("<I", 5) + struct.pack("<5d", 0.1, -0.2, 0, 0, 0)
                       + struct.pack("<9d", *K)
                       + struct.pack("<9d", 1, 0, 0, 0, 1, 0, 0, 0, 1)
                       + struct.pack("<12d", 525.0, 0, 319.5, 0, 0, 525.0, 239.5, 0,
                                     0, 0, 1, 0)
                       + struct.pack("<II", 0, 0)         # binning x/y
                       + struct.pack("<IIIIB", 0, 0, 0, 0, 0))  # roi
    msg_cam = _record([("op", b"\x02"), ("conn", struct.pack("<I", 2)),
                       ("time", struct.pack("<II", 1700000000, 250000001))],
                      caminfo_payload)

    pose_payload = (_ros_std_header(8, 1700000000, 300000000, "world")
                    + struct.pack("<7d", 0.1, -0.2, 0.9,   # position
                                  0.0, 0.0, 0.0, 1.0))     # orientation xyzw
    msg_pose = _record([("op", b"\x02"), ("conn", struct.pack("<I", 1)),
                        ("time", struct.pack("<II", 1700000000, 300000000))],
                       pose_payload)

    chunk_plain = conn0 + conn1 + conn2 + msg_img + msg_cam + msg_pose
    chunk_bz2 = bz2.compress(chunk_plain)
    chunk = _record([("op", b"\x05"), ("compression", b"bz2"),
                     ("size", struct.pack("<I", len(chunk_plain)))], chunk_bz2)

    # index data (op=0x04) after the chunk — ver 1, (time, offset) pairs;
    # readers that don't random-access must SKIP these.
    idx = _record([("op", b"\x04"), ("ver", struct.pack("<I", 1)),
                   ("conn", struct.pack("<I", 0)),
                   ("count", struct.pack("<I", 1))],
                  struct.pack("<III", 1700000000, 250000000, 0))

    # bag header: padded to 4096 bytes of record data per the spec
    bag_header = _record(
        [("op", b"\x03"),
         ("index_pos", struct.pack("<Q", 0)),
         ("conn_count", struct.pack("<I", 3)),
         ("chunk_count", struct.pack("<I", 1))],
        b" " * 4096)

    # trailing connection + chunk-info records (the "index" section)
    chunk_info = _record(
        [("op", b"\x06"), ("ver", struct.pack("<I", 1)),
         ("chunk_pos", struct.pack("<Q", 0)),
         ("start_time", struct.pack("<II", 1700000000, 250000000)),
         ("end_time", struct.pack("<II", 1700000000, 300000000)),
         ("count", struct.pack("<I", 3))],
        struct.pack("<II", 0, 1) + struct.pack("<II", 1, 1)
        + struct.pack("<II", 2, 1))

    out = (b"#ROSBAG V2.0\n" + bag_header + chunk + idx
           + conn0 + conn1 + conn2 + chunk_info)
    path.write_bytes(out)


def main():
    ply_dir = HERE / "ply"
    ply_dir.mkdir(parents=True, exist_ok=True)
    ply_bop_toolkit_flavor(ply_dir / "bop_toolkit_flavor.ply")
    ply_int_count_flavor(ply_dir / "int_count_flavor.ply")
    ply_ascii_quad_flavor(ply_dir / "ascii_quad.ply")
    ply_big_endian_flavor(ply_dir / "big_endian.ply")
    ply_mixed_quad_binary(ply_dir / "mixed_quad_binary.ply")
    bop_tree(HERE / "bop")
    (HERE / "rosbag").mkdir(exist_ok=True)
    rosbag_fixture(HERE / "rosbag" / "tracker.bag")
    print("fixtures written under", HERE)


if __name__ == "__main__":
    main()
