"""Parsers vs spec-conformant golden bytes (VERDICT r3 missing #4).

The fixtures under tests/fixtures/ are authored directly from the public
format specs (PLY, BOP-toolkit dataset layout, ROS1 bag v2.0) by
tests/fixtures/make_fixtures.py — NOT by this repo's writers — so these
tests catch the writer-reader-collusion bug class (e.g. the round-2 bag
'time'-field encoding bug, which round-trip tests could never see).
"""

import numpy as np
import pytest

from bayesianposeestimation.jl_tpu.utils import bop, rosbag

from pathlib import Path

FIX = Path(__file__).resolve().parent / "fixtures"
MM = 1e-3


# --------------------------------------------------------------------------- #
# PLY flavors
# --------------------------------------------------------------------------- #

TET_VERTS_M = np.array(
    [[0, 0, 0], [0.1, 0, 0], [0, 0.1, 0], [0, 0, 0.1]], np.float32)


def test_ply_bop_toolkit_flavor_normals_and_colors_skipped():
    mesh = bop.load_ply(FIX / "ply" / "bop_toolkit_flavor.ply")
    np.testing.assert_allclose(mesh.vertices, TET_VERTS_M, atol=1e-7)
    assert mesh.faces.shape == (2, 3)
    np.testing.assert_array_equal(mesh.faces, [[0, 2, 1], [0, 1, 3]])


def test_ply_int_count_flavor():
    # 'property list int int vertex_indices' — 4-byte counts; a reader that
    # assumes uchar counts reads k=3 from the count's low byte and then
    # garbage indices.
    mesh = bop.load_ply(FIX / "ply" / "int_count_flavor.ply")
    np.testing.assert_allclose(mesh.vertices, TET_VERTS_M, atol=1e-7)
    np.testing.assert_array_equal(mesh.faces, [[0, 2, 1], [0, 1, 3]])


def test_ply_ascii_quad_fan_triangulated():
    mesh = bop.load_ply(FIX / "ply" / "ascii_quad.ply")
    assert mesh.vertices.shape == (4, 3)
    # quad 0-1-2-3 -> triangles (0,1,2), (0,2,3)
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2], [0, 2, 3]])


def test_ply_mixed_tri_quad_binary():
    mesh = bop.load_ply(FIX / "ply" / "mixed_quad_binary.ply")
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 4], [0, 1, 2], [0, 2, 3]])


def test_ply_big_endian_refused():
    with pytest.raises(ValueError, match="binary_big_endian"):
        bop.load_ply(FIX / "ply" / "big_endian.ply")


# --------------------------------------------------------------------------- #
# BOP dataset tree (T-LESS/ITODD flavor: depth_scale 0.1, w2c keys present)
# --------------------------------------------------------------------------- #

VAL = FIX / "bop" / "specfix" / "val"


def test_gt_dataframe_millimeters_to_meters_and_extra_camera_keys():
    df = bop.gt_dataframe(VAL, 1)
    assert len(df) == 3
    r = df[(df.img_id == 0) & (df.gt_id == 0)].iloc[0]
    np.testing.assert_allclose(r.gt_t, [0.010, -0.020, 1.000])
    np.testing.assert_array_equal(r.gt_R, np.eye(3))
    assert r.depth_scale == 0.1
    r2 = df[(df.img_id == 0) & (df.gt_id == 1)].iloc[0]
    assert r2.obj_id == 2
    np.testing.assert_array_equal(r2.gt_R, np.diag([-1.0, -1.0, 1.0]))


def test_depth_image_honors_depth_scale():
    df = bop.train_targets(VAL, 1)
    row = df[(df.img_id == 0)].iloc[0]
    depth = bop.load_depth_image(row)
    # raw 1000*(i+1) at depth_scale 0.1 -> meters = raw*0.1*1e-3
    assert depth.shape == (8, 8)
    assert depth[0, 0] == 0.0  # invalid stays 0
    np.testing.assert_allclose(depth[0, 1], 2000 * 0.1 * MM)
    np.testing.assert_allclose(depth[7, 7], 64000 * 0.1 * MM)


def test_visib_fract_and_bbox_joined():
    df = bop.train_targets(VAL, 1)
    r = df[(df.img_id == 0) & (df.gt_id == 1)].iloc[0]
    assert r.visib_fract == 0.25
    assert r.bbox_visib == [300, 200, 10, 40]


def test_test_targets_filters_by_official_list():
    df = bop.test_targets(VAL, 1)
    # obj 2 of image 0 is not in test_targets_bop19.json; scene 99 ignored
    assert set(zip(df.img_id, df.obj_id)) == {(0, 1), (1, 1)}


def test_mask_visib_naming_and_booleanness():
    df = bop.train_targets(VAL, 1)
    r0 = df[(df.img_id == 0) & (df.gt_id == 0)].iloc[0]
    r1 = df[(df.img_id == 0) & (df.gt_id == 1)].iloc[0]
    m0, m1 = bop.load_mask_image(r0), bop.load_mask_image(r1)
    assert m0.dtype == bool and m0.sum() == 16
    assert m1.sum() == 4 and m1[0, 7] and not m1[7, 0]


def test_camera_for_row_intrinsics():
    df = bop.train_targets(VAL, 1)
    cam = bop.camera_for_row(df.iloc[0])
    assert cam.width == 8 and cam.height == 8
    np.testing.assert_allclose(float(cam.f_x), 572.4114)
    np.testing.assert_allclose(float(cam.c_y), 242.04899)


def test_model_diameter_and_mesh_from_row():
    df = bop.train_targets(VAL, 1)
    row = df[(df.img_id == 0) & (df.gt_id == 0)].iloc[0]
    assert abs(bop.model_diameter(row) - 0.1732051) < 1e-6
    mesh = bop.load_mesh(row)
    assert mesh.n_vertices == 4 and mesh.n_faces == 2
    # obj 2 uses the int-count PLY flavor
    row2 = df[(df.img_id == 0) & (df.gt_id == 1)].iloc[0]
    mesh2 = bop.load_mesh(row2)
    assert mesh2.n_faces == 2
    assert np.abs(mesh2.vertices).max() <= 0.1 + 1e-6


# --------------------------------------------------------------------------- #
# ROS1 bag v2.0
# --------------------------------------------------------------------------- #

BAG = FIX / "rosbag" / "tracker.bag"


def test_bag_bz2_chunk_and_skipped_index_records():
    msgs = list(rosbag.read_bag(BAG))
    # exactly the three chunked messages; index/chunk-info/trailing
    # connection records must not produce output or crash
    assert [m[1] for m in msgs] == [
        "sensor_msgs/Image", "sensor_msgs/CameraInfo", "geometry_msgs/PoseStamped"]


def test_bag_image_message_fields():
    topic, _, stamp, msg = next(iter(rosbag.read_bag(BAG, topics={"/camera/depth/image_rect"})))
    assert topic == "/camera/depth/image_rect"
    assert stamp == 1700000000 * 10**9 + 250000000  # secs+nsecs, NOT u64 ns
    assert (msg["height"], msg["width"]) == (2, 2)
    assert msg["encoding"] == "16UC1"
    px = np.frombuffer(msg["data"], "<u2").reshape(2, 2)
    np.testing.assert_array_equal(px, [[500, 600], [700, 800]])
    assert msg["header"]["frame_id"] == "camera_depth_frame"
    assert abs(msg["header"]["stamp"] - 1700000000.25) < 1e-6


def test_bag_topic_only_in_connection_data():
    # conn 1's record header has no 'topic' field; the spec keeps it in the
    # connection DATA header — readers must fall back there.
    msgs = list(rosbag.read_bag(BAG, topics={"/tf_gt_pose"}))
    assert len(msgs) == 1
    _, msgtype, stamp, msg = msgs[0]
    assert msgtype == "geometry_msgs/PoseStamped"
    assert stamp == 1700000000 * 10**9 + 300000000
    assert msg["position"] == {"x": 0.1, "y": -0.2, "z": 0.9}
    assert msg["orientation"]["w"] == 1.0


def test_bag_camera_info_K_and_D():
    msgs = list(rosbag.read_bag(BAG, topics={"/camera/depth/camera_info"}))
    (_, _, _, msg), = msgs
    np.testing.assert_allclose(np.asarray(msg["K"]).reshape(3, 3)[0],
                               [525.0, 0.0, 319.5])
    np.testing.assert_allclose(msg["D"][:2], [0.1, -0.2])
    assert (msg["height"], msg["width"]) == (480, 640)


def test_fixtures_regenerate_deterministically(tmp_path):
    # the checked-in bytes must match what make_fixtures.py produces, so the
    # fixtures can't drift from their authoring spec silently
    import importlib.util
    spec = importlib.util.spec_from_file_location("mk", FIX / "make_fixtures.py")
    mk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mk)
    p = tmp_path / "t.bag"
    mk.rosbag_fixture(p)
    assert p.read_bytes() == BAG.read_bytes()
    p2 = tmp_path / "t.ply"
    mk.ply_int_count_flavor(p2)
    assert p2.read_bytes() == (FIX / "ply" / "int_count_flavor.ply").read_bytes()
