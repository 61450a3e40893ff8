"""BOP benchmark dataset I/O.

Rebuilds the PoseErrors.jl loading surface the reference uses (SURVEY.md §2B;
call sites at /root/reference/src/ExperimentUtils.jl:14-32,
/root/reference/scripts/smc_bop_val.jl:117,130-132):
``train_targets``/``test_targets``/``gt_targets``, ``load_depth_image``,
``load_color_image``, ``load_mask_image``, ``load_segmentation``,
``load_mesh``, ``model_diameter``, ``depth_resize``, ``gt_dataframe``,
``gt_info_dataframe`` and ``bop_test_or_train``.

Dataset layout (BOP toolkit convention)::

    <bop_dir>/<dataset>/<split>/<scene_id:06d>/
        scene_camera.json   # per image: cam_K (3x3 row-major), depth_scale
        scene_gt.json       # per image: [{obj_id, cam_R_m2c, cam_t_m2c(mm)}]
        scene_gt_info.json  # per image: [{bbox_visib, visib_fract, ...}]
        depth/<im_id:06d>.png        # uint16, value * depth_scale = mm
        mask_visib/<im_id:06d>_<gt_id:06d>.png
    <bop_dir>/<dataset>/models/models_info.json   # diameter in mm
    <bop_dir>/<dataset>/models/obj_<obj_id:06d>.ply

All distances convert to meters on load (the reference's convention).
Rows are plain dicts gathered in pandas DataFrames.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np
import pandas as pd

from ..camera import CvCamera
from . import mesh_io

__all__ = [
    "bop_test_or_train",
    "train_targets",
    "test_targets",
    "gt_targets",
    "gt_dataframe",
    "gt_info_dataframe",
    "load_depth_image",
    "load_color_image",
    "load_mask_image",
    "load_segmentation",
    "load_mesh",
    "load_mesh_eval",
    "model_diameter",
    "depth_resize",
    "load_ply",
    "camera_for_row",
]

MM_TO_M = 1.0e-3


def _scene_dir(datasubset_path, scene_id) -> Path:
    return Path(datasubset_path) / f"{int(scene_id):06d}"


def _load_json(path):
    with open(path) as fh:
        return json.load(fh)


def _scene_camera(datasubset_path, scene_id):
    return _load_json(_scene_dir(datasubset_path, scene_id) / "scene_camera.json")


def gt_dataframe(datasubset_path, scene_id) -> pd.DataFrame:
    """Ground-truth poses of one scene: columns scene_id, img_id, gt_id,
    obj_id, gt_t [m], gt_R [3,3], cv_camera, depth_scale
    (parity: PoseErrors.gt_dataframe)."""
    sdir = _scene_dir(datasubset_path, scene_id)
    gt = _load_json(sdir / "scene_gt.json")
    cams = _scene_camera(datasubset_path, scene_id)
    rows = []
    for img_id, entries in gt.items():
        cam = cams[str(img_id)]
        K = np.asarray(cam["cam_K"], float).reshape(3, 3)
        for gt_id, e in enumerate(entries):
            rows.append(
                dict(
                    scene_id=int(scene_id),
                    img_id=int(img_id),
                    gt_id=gt_id,
                    obj_id=int(e["obj_id"]),
                    gt_t=np.asarray(e["cam_t_m2c"], float) * MM_TO_M,
                    gt_R=np.asarray(e["cam_R_m2c"], float).reshape(3, 3),
                    cam_K=K,
                    depth_scale=float(cam.get("depth_scale", 1.0)),
                )
            )
    return pd.DataFrame(rows)


def gt_info_dataframe(datasubset_path, scene_id) -> pd.DataFrame:
    """Visibility info (parity: PoseErrors.gt_info_dataframe)."""
    sdir = _scene_dir(datasubset_path, scene_id)
    info = _load_json(sdir / "scene_gt_info.json")
    rows = []
    for img_id, entries in info.items():
        for gt_id, e in enumerate(entries):
            rows.append(
                dict(
                    scene_id=int(scene_id),
                    img_id=int(img_id),
                    gt_id=gt_id,
                    visib_fract=float(e.get("visib_fract", 1.0)),
                    bbox_visib=e.get("bbox_visib"),
                    bbox_obj=e.get("bbox_obj"),
                )
            )
    return pd.DataFrame(rows)


def train_targets(datasubset_path, scene_id) -> pd.DataFrame:
    """All ground-truth annotations of a scene as estimation targets,
    joined with visibility info (parity: PoseErrors.train_targets —
    'does not use test_targets_bop19.json')."""
    df = gt_dataframe(datasubset_path, scene_id)
    info = gt_info_dataframe(datasubset_path, scene_id)
    df = df.merge(info, on=["scene_id", "img_id", "gt_id"])
    df["datasubset_path"] = str(datasubset_path)
    return df


def test_targets(datasubset_path, scene_id, targets_json="test_targets_bop19.json") -> pd.DataFrame:
    """Targets restricted to the official BOP19 test list
    (parity: PoseErrors.test_targets)."""
    base = Path(datasubset_path).parent
    targets = _load_json(base / targets_json)
    wanted = {
        (int(t["scene_id"]), int(t["im_id"]), int(t["obj_id"]))
        for t in targets
        if int(t["scene_id"]) == int(scene_id)
    }
    df = train_targets(datasubset_path, scene_id)
    keep = df.apply(lambda r: (r.scene_id, r.img_id, r.obj_id) in wanted, axis=1)
    return df[keep].reset_index(drop=True)


gt_targets = train_targets


def bop_test_or_train(bop_dir, dataset, testset, scene_id) -> pd.DataFrame:
    """Dispatch on split name (parity: /root/reference/src/ExperimentUtils.jl:14-21)."""
    datasubset_path = Path(bop_dir) / dataset / testset
    if "test" in testset:
        return test_targets(datasubset_path, scene_id)
    return train_targets(datasubset_path, scene_id)


# --------------------------------------------------------------------------- #
# Images
# --------------------------------------------------------------------------- #


def _imread(path):
    import imageio.v3 as iio

    return np.asarray(iio.imread(path))


def load_depth_image(row, width=None, height=None):
    """Depth in meters, [H, W] float32; optionally resized (nearest,
    invalid-preserving). Invalid pixels are 0 (the Experiment preprocessing
    maps them to inf). Parity: PoseErrors.load_depth_image."""
    sdir = _scene_dir(row["datasubset_path"], row["scene_id"])
    raw = _imread(sdir / "depth" / f"{int(row['img_id']):06d}.png").astype(np.float32)
    depth = raw * row.get("depth_scale", 1.0) * MM_TO_M
    if width is not None:
        depth = depth_resize(depth, width, height)
    return depth


def load_color_image(row, width=None, height=None):
    sdir = _scene_dir(row["datasubset_path"], row["scene_id"])
    for sub in ("rgb", "gray"):
        p = sdir / sub / f"{int(row['img_id']):06d}.png"
        if p.exists():
            img = _imread(p)
            break
        p = sdir / sub / f"{int(row['img_id']):06d}.jpg"
        if p.exists():
            img = _imread(p)
            break
    else:
        raise FileNotFoundError(f"no color image for {row['img_id']}")
    if width is not None:
        vi = (np.arange(height) * img.shape[0] // height)
        ui = (np.arange(width) * img.shape[1] // width)
        img = img[vi][:, ui]
    return img


def load_mask_image(row, width=None, height=None):
    """Visible-surface mask of the gt instance, bool [H, W]
    (parity: PoseErrors.load_mask_image)."""
    sdir = _scene_dir(row["datasubset_path"], row["scene_id"])
    p = sdir / "mask_visib" / f"{int(row['img_id']):06d}_{int(row['gt_id']):06d}.png"
    mask = _imread(p) > 0
    if width is not None:
        mask = depth_resize(mask.astype(np.float32), width, height) > 0.5
    return mask


def load_segmentation(row, width=None, height=None):
    """Alias of the visible mask (the reference uses external detections for
    test; for val/train the gt visib mask stands in)."""
    return load_mask_image(row, width, height)


def depth_resize(img, width, height):
    """Nearest-neighbor resize preserving invalid values exactly
    (parity: PoseErrors.depth_resize — interpolation would corrupt depth
    edges and invalid-pixel semantics)."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    vi = (np.arange(height) * h // height).astype(int)
    ui = (np.arange(width) * w // width).astype(int)
    return img[vi][:, ui]


def camera_for_row(row, width=None, height=None, near=0.01, far=10.0) -> CvCamera:
    """CvCamera from the BOP intrinsics, optionally rescaled."""
    K = np.asarray(row["cam_K"], float).reshape(3, 3)
    # native BOP image sizes differ per dataset; infer lazily from the depth
    img = load_depth_image(row)
    cam = CvCamera(width=img.shape[1], height=img.shape[0],
                   f_x=K[0, 0], f_y=K[1, 1], c_x=K[0, 2], c_y=K[1, 2],
                   s=K[0, 1], near=near, far=far)
    if width is not None:
        cam = cam.scale_to(width, height)
    return cam


# --------------------------------------------------------------------------- #
# Meshes (BOP ships PLY)
# --------------------------------------------------------------------------- #


_STRUCT_FMT = {"u1": "B", "u2": "H", "u4": "I", "i1": "b", "i2": "h", "i4": "i"}


def _parse_mixed_faces(buf: bytes, n_faces: int, count_np="u1", index_np="i4") -> np.ndarray:
    """Slow path: variable-vertex-count polygon list, fan-triangulated."""
    faces = []
    off = 0
    count_fmt = _STRUCT_FMT[count_np]
    count_size = int(count_np[1])
    index_fmt = _STRUCT_FMT[index_np]
    index_size = int(index_np[1])
    for _ in range(n_faces):
        (k,) = struct.unpack_from("<" + count_fmt, buf, off)
        off += count_size
        idx = struct.unpack_from(f"<{k}{index_fmt}", buf, off)
        off += index_size * k
        for i in range(1, k - 1):
            faces.append([idx[0], idx[i], idx[i + 1]])
    return np.asarray(faces, np.int32)


def load_ply(path, scale=MM_TO_M) -> mesh_io.Mesh:
    """Minimal PLY parser (ascii + binary_little_endian) for BOP models.
    BOP vertices are in millimeters -> meters by default."""
    with open(path, "rb") as fh:
        magic = fh.readline().strip()
        assert magic == b"ply", f"not a PLY file: {path}"
        fmt = None
        n_verts = n_faces = 0
        vert_props = []
        face_list_types = ("uchar", "int")  # BOP-toolkit default
        element = None
        while True:
            line = fh.readline().decode("ascii").strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element vertex"):
                n_verts = int(line.split()[-1])
                element = "vertex"
            elif line.startswith("element face"):
                n_faces = int(line.split()[-1])
                element = "face"
            elif line.startswith("element"):
                element = "other"
            elif line.startswith("property") and element == "vertex":
                parts = line.split()
                vert_props.append((parts[-1], parts[1]))
            elif line.startswith("property list") and element == "face":
                # "property list <count_t> <index_t> vertex_indices" — honor
                # the declared types; assuming uchar+int silently misparses
                # int-count flavors (k reads the count's low byte).
                parts = line.split()
                face_list_types = (parts[2], parts[3])
            elif line == "end_header":
                break

        if fmt not in ("ascii", "binary_little_endian"):
            # refuse rather than silently misparse big-endian bytes with
            # little-endian dtypes (BOP ships little-endian only)
            raise ValueError(f"unsupported PLY format {fmt!r} in {path}")
        type_map = {"float": "f4", "float32": "f4", "double": "f8",
                    "uchar": "u1", "uint8": "u1", "int": "i4", "int32": "i4",
                    "uint": "u4", "short": "i2", "ushort": "u2"}
        if fmt == "ascii":
            verts = []
            for _ in range(n_verts):
                vals = fh.readline().split()
                verts.append([float(vals[0]), float(vals[1]), float(vals[2])])
            faces = []
            for _ in range(n_faces):
                vals = fh.readline().split()
                k = int(vals[0])
                idx = [int(v) for v in vals[1:1 + k]]
                for i in range(1, k - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
            v = np.asarray(verts, np.float32)
            f = np.asarray(faces, np.int32)
        else:
            dtype = np.dtype([(name, "<" + type_map[t]) for name, t in vert_props])
            raw = fh.read(n_verts * dtype.itemsize)
            rec = np.frombuffer(raw, dtype=dtype, count=n_verts)
            v = np.stack([rec["x"], rec["y"], rec["z"]], axis=1).astype(np.float32)
            face_raw = fh.read()
            count_np = type_map[face_list_types[0]]
            index_np = type_map[face_list_types[1]]
            # fast path: all-triangle face list parses as fixed (count + 3*idx)
            # records in one vectorized pass (BOP models have 10^4-10^6
            # faces; the per-face struct.unpack loop took seconds)
            tri_dtype = np.dtype([("k", "<" + count_np), ("idx", "<" + index_np, (3,))])
            if len(face_raw) >= n_faces * tri_dtype.itemsize:
                tris = np.frombuffer(face_raw, dtype=tri_dtype, count=n_faces)
                if np.all(tris["k"] == 3):
                    f = np.ascontiguousarray(tris["idx"]).astype(np.int32)
                else:
                    f = _parse_mixed_faces(face_raw, n_faces, count_np, index_np)
            else:
                f = _parse_mixed_faces(face_raw, n_faces, count_np, index_np)
    return mesh_io.Mesh(v * scale, f)


def load_mesh(row_or_path, models_dir=None, decimate_to=None) -> mesh_io.Mesh:
    """Object mesh for a target row (parity: PoseErrors.load_mesh).

    ``decimate_to``: optional triangle budget — BOP models carry far more
    triangles than a 30x30 render needs; see mesh_io/decimate.
    """
    if isinstance(row_or_path, (str, Path)):
        path = Path(row_or_path)
    else:
        row = row_or_path
        base = Path(row["datasubset_path"]).parent / "models"
        if models_dir is not None:
            base = Path(models_dir)
        path = base / f"obj_{int(row['obj_id']):06d}.ply"
    mesh = mesh_io.fix_winding(load_ply(path))
    # fix_winding: the fused renderer backface-culls by default (area<0 keeps
    # front faces); a majority-inward PLY would silently render empty depth
    # maps. load_obj already reorients; PLY must too.
    if decimate_to is not None and mesh.n_faces > decimate_to:
        from .decimate import decimate as _dec

        mesh = _dec(mesh, decimate_to)
    return mesh


load_mesh_eval = load_mesh


def model_diameter(row_or_models_info, obj_id=None):
    """Object diameter in meters from models_info.json
    (parity: PoseErrors.model_diameter)."""
    if obj_id is None:
        row = row_or_models_info
        info_path = Path(row["datasubset_path"]).parent / "models" / "models_info.json"
        obj_id = int(row["obj_id"])
    else:
        info_path = Path(row_or_models_info)
    info = _load_json(info_path)
    return float(info[str(obj_id)]["diameter"]) * MM_TO_M
