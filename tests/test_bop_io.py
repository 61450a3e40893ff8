"""BOP dataset I/O tests against a synthetic miniature dataset on disk."""

import json
from pathlib import Path

import numpy as np
import pytest

from bayesianposeestimation.jl_tpu.utils import bop, mesh_io
from bayesianposeestimation.jl_tpu.utils.decimate import decimate


@pytest.fixture(scope="module")
def mini_bop(tmp_path_factory):
    """Create a tiny BOP-format dataset: 1 scene, 2 images, 1 object."""
    import imageio.v3 as iio

    root = tmp_path_factory.mktemp("bop") / "mini" / "val"
    sdir = root / "000001"
    (sdir / "depth").mkdir(parents=True)
    (sdir / "mask_visib").mkdir()
    models = root.parent / "models"
    models.mkdir()

    K = [500.0, 0.0, 32.0, 0.0, 500.0, 24.0, 0.0, 0.0, 1.0]
    cams, gts, infos = {}, {}, {}
    rng = np.random.default_rng(0)
    for img_id in (0, 1):
        cams[str(img_id)] = {"cam_K": K, "depth_scale": 0.1}
        R = np.eye(3)
        gts[str(img_id)] = [{
            "obj_id": 7,
            "cam_R_m2c": R.ravel().tolist(),
            "cam_t_m2c": [10.0, -20.0, 1000.0],  # mm
        }]
        infos[str(img_id)] = [{"visib_fract": 0.9, "bbox_visib": [10, 8, 20, 16]}]
        depth_mm = rng.integers(8000, 12000, (48, 64)).astype(np.uint16)  # *0.1 = mm
        depth_mm[:4] = 0  # invalid band
        iio.imwrite(sdir / "depth" / f"{img_id:06d}.png", depth_mm)
        mask = np.zeros((48, 64), np.uint8)
        mask[8:24, 10:30] = 255
        iio.imwrite(sdir / "mask_visib" / f"{img_id:06d}_000000.png", mask)

    for name, obj in [("scene_camera.json", cams), ("scene_gt.json", gts),
                      ("scene_gt_info.json", infos)]:
        (sdir / name).write_text(json.dumps(obj))

    # object 7: icosphere in millimeters, ascii PLY
    mesh = mesh_io.icosphere_mesh(50.0, 1)  # 50 mm radius
    ply = ["ply", "format ascii 1.0", f"element vertex {mesh.n_vertices}",
           "property float x", "property float y", "property float z",
           f"element face {mesh.n_faces}", "property list uchar int vertex_indices",
           "end_header"]
    for v in mesh.vertices:
        ply.append(f"{v[0]} {v[1]} {v[2]}")
    for f in mesh.faces:
        ply.append(f"3 {f[0]} {f[1]} {f[2]}")
    (models / "obj_000007.ply").write_text("\n".join(ply))
    (models / "models_info.json").write_text(json.dumps({"7": {"diameter": 100.0}}))
    (root.parent / "test_targets_bop19.json").write_text(json.dumps(
        [{"im_id": 0, "inst_count": 1, "obj_id": 7, "scene_id": 1}]))
    return root


def test_train_targets(mini_bop):
    df = bop.train_targets(mini_bop, 1)
    assert len(df) == 2
    row = df.iloc[0]
    np.testing.assert_allclose(row.gt_t, [0.01, -0.02, 1.0])
    assert row.visib_fract == pytest.approx(0.9)
    assert row.obj_id == 7


def test_test_targets_filtered(mini_bop):
    df = bop.test_targets(mini_bop, 1)
    assert len(df) == 1
    assert df.iloc[0].img_id == 0


def test_depth_and_mask_loading(mini_bop):
    df = bop.train_targets(mini_bop, 1)
    row = df.iloc[0]
    depth = bop.load_depth_image(row)
    assert depth.shape == (48, 64)
    assert depth[10, 10] == pytest.approx(1.0, abs=0.25)  # ~1 m
    assert depth[0, 0] == 0.0  # invalid stays 0
    small = bop.load_depth_image(row, 32, 24)
    assert small.shape == (24, 32)
    mask = bop.load_mask_image(row)
    assert mask[10, 15] and not mask[0, 0]


def test_camera_and_mesh(mini_bop):
    df = bop.train_targets(mini_bop, 1)
    row = df.iloc[0]
    cam = bop.camera_for_row(row)
    assert cam.f_x == pytest.approx(500.0)
    cam30 = bop.camera_for_row(row, 32, 24)
    assert cam30.width == 32
    mesh = bop.load_mesh(row)
    # mm -> m conversion: radius 0.05
    r = np.linalg.norm(mesh.vertices, axis=1)
    np.testing.assert_allclose(r, 0.05, atol=1e-4)
    assert bop.model_diameter(row) == pytest.approx(0.1)


def test_binary_ply_roundtrip(tmp_path):
    """Binary little-endian PLY parses identically to ascii."""
    mesh = mesh_io.icosphere_mesh(30.0, 1)
    p = tmp_path / "obj.ply"
    with open(p, "wb") as fh:
        header = (f"ply\nformat binary_little_endian 1.0\n"
                  f"element vertex {mesh.n_vertices}\n"
                  "property float x\nproperty float y\nproperty float z\n"
                  f"element face {mesh.n_faces}\n"
                  "property list uchar int vertex_indices\nend_header\n")
        fh.write(header.encode())
        fh.write(np.ascontiguousarray(mesh.vertices, "<f4").tobytes())
        for f in mesh.faces:
            fh.write(np.uint8(3).tobytes())
            fh.write(np.ascontiguousarray(f, "<i4").tobytes())
    out = bop.load_ply(p)
    np.testing.assert_allclose(out.vertices, mesh.vertices * 1e-3, rtol=1e-6)
    np.testing.assert_array_equal(out.faces, mesh.faces)


def test_decimate_budget():
    mesh = mesh_io.icosphere_mesh(0.05, 3)  # 1280 faces
    out = decimate(mesh, 300)
    assert out.n_faces <= 330
    assert out.n_faces > 100
    # geometry preserved: radii near 0.05
    r = np.linalg.norm(out.vertices, axis=1)
    assert np.abs(r - 0.05).max() < 0.005
    # winding preserved (signed volume positive)
    tri = out.vertices[out.faces]
    svol = np.einsum("fi,fi->f", tri[:, 0], np.cross(tri[:, 1], tri[:, 2])).sum()
    assert svol > 0


def test_obj_winding_fix(tmp_path):
    mesh = mesh_io.cube_mesh(0.1)
    flipped = mesh_io.Mesh(mesh.vertices, mesh.faces[:, ::-1])
    p = tmp_path / "flipped.obj"
    mesh_io.save_obj(str(p), flipped)
    loaded = mesh_io.load_obj(str(p))
    tri = loaded.vertices[loaded.faces]
    svol = np.einsum("fi,fi->f", tri[:, 0], np.cross(tri[:, 1], tri[:, 2])).sum()
    assert svol > 0  # reoriented outward


def test_load_ply_binary_fast_path(tmp_path):
    """Binary all-triangle PLY parses through the vectorized path."""
    import struct

    import numpy as np

    from bayesianposeestimation.jl_tpu.utils.bop import load_ply

    verts = np.asarray([[0, 0, 0], [1000, 0, 0], [0, 1000, 0], [0, 0, 1000]],
                       np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 4\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"element face 2\n"
              b"property list uchar int vertex_indices\nend_header\n")
    body = verts.astype("<f4").tobytes()
    for f in faces:
        body += struct.pack("<B3i", 3, *f)
    p = tmp_path / "tri.ply"
    p.write_bytes(header + body)
    mesh = load_ply(p)
    assert mesh.n_faces == 2
    np.testing.assert_allclose(mesh.vertices.max(), 1.0)  # mm -> m


def test_load_ply_binary_quads_fallback(tmp_path):
    """Quads fan-triangulate through the mixed-face fallback."""
    import struct

    import numpy as np

    from bayesianposeestimation.jl_tpu.utils.bop import load_ply

    verts = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 4\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"element face 1\n"
              b"property list uchar int vertex_indices\nend_header\n")
    body = verts.astype("<f4").tobytes() + struct.pack("<B4i", 4, 0, 1, 2, 3)
    p = tmp_path / "quad.ply"
    p.write_bytes(header + body)
    mesh = load_ply(p)
    assert mesh.n_faces == 2  # one quad -> two triangles
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2], [0, 2, 3]])
