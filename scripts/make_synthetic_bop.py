"""Generate synthetic BOP-format datasets from procedural meshes.

Renders ground-truth poses of generated objects into BOP-convention scene
directories (scene_gt.json, scene_camera.json, depth/, mask_visib/, models/),
so the full BOP pipeline (scripts/smc_bop_val.py, evaluation, recall) runs
end-to-end without downloading datasets. The reference assumes datasets are
dropped into data/bop (/root/reference/data/bop/README.md).

Two profiles:

* ``easy`` (dataset ``synth``) — the round-1/2 set: three <=1.3k-face meshes,
  optional second occluding instance, clean depth + flat background. Kept
  for the saturated-regime artifacts and fast tests.
* ``cad`` (dataset ``synthcad``) — the reference's operating point
  (/root/reference/scripts/smc_bop_val.jl:45-63 ran lm/tless/itodd: scanned
  and CAD models of 10^4-10^5+ faces under real Kinect depth): 82k-128k-face
  models written as binary PLY (millimeters), scenes with unannotated
  low-poly clutter in FRONT of the targets, a structured tabletop background,
  and Kinect-style sensor artifacts (depth-dependent axial noise, silhouette
  dropout, speckle holes, 1 mm quantization). Recall on this set is NOT
  saturated — it separates samplers again.

Usage:
    python scripts/make_synthetic_bop.py                       # easy
    python scripts/make_synthetic_bop.py --profile cad --n-scenes 4
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the axon sitecustomize force-sets jax_platforms="axon,cpu"; honor an
# explicit JAX_PLATFORMS choice (generation is feasible on CPU for the small
# easy/hard meshes when the TPU tunnel is wedged)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Static solo-render window (px): big enough for every object at its nearest
# sampled distance; one compiled render program per mesh regardless of where
# the object lands in the VGA frame.
WINDOW = 160


def build_objects(profile):
    from bayesianposeestimation.jl_tpu.utils import mesh_io
    import numpy as np

    if profile in ("easy", "hard"):
        return {
            1: mesh_io.monkey_mesh(0.08),
            2: mesh_io.cube_mesh(0.08),
            3: mesh_io.icosphere_mesh(0.04, 2),
        }

    def shaft_profile(z):
        # machined shaft: steps + thread-like grooves + a collar
        r = 0.028 + 0.006 * np.sin(40 * np.pi * z)
        r = r + np.where(np.abs(z) < 0.02, 0.008, 0.0)
        return np.clip(r, 0.008, None)

    return {
        1: mesh_io.displaced_icosphere(0.05, 6, seed=1),     # 81,920 faces
        2: mesh_io.lathe_mesh(shaft_profile, -0.06, 0.06),   # 128,000 faces
        3: mesh_io.torus_mesh(0.045, 0.016),                 # 102,400 faces
    }


def make_clutter_library(rng):
    """Unannotated distractor meshes — generic junk that is NOT in models/
    (real BOP scenes are full of un-modeled objects; the likelihood must
    reject their depth instead of latching onto it)."""
    from bayesianposeestimation.jl_tpu.utils import mesh_io

    lib = []
    for i in range(6):
        kind = i % 3
        s = rng.uniform(0.04, 0.09)
        if kind == 0:
            lib.append(mesh_io.cube_mesh(s))
        elif kind == 1:
            lib.append(mesh_io.icosphere_mesh(s / 2, 2))
        else:
            lib.append(mesh_io.monkey_mesh(s))
    return lib


def window_origin(cam, t, margin=WINDOW):
    """Top-left corner of the WINDOW x WINDOW native-resolution sub-image
    centered on the projection of t, clamped inside the frame."""
    import numpy as np

    u = cam.f_x * t[0] / t[2] + cam.c_x
    v = cam.f_y * t[1] / t[2] + cam.c_y
    x0 = int(np.clip(round(u - WINDOW / 2), 0, cam.width - WINDOW))
    y0 = int(np.clip(round(v - WINDOW / 2), 0, cam.height - WINDOW))
    return x0, y0


def render_solo(mesh_dev, cam, t, q, x0, y0):
    """Full-frame solo depth (np.inf = background) rendered at native pixel
    density inside the window only: a window camera is the full camera with
    the principal point shifted by the window origin — identical pixel grid,
    ~20x fewer pixels than VGA."""
    import jax.numpy as jnp
    import numpy as np

    from bayesianposeestimation.jl_tpu.camera import CvCamera
    from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth

    win_cam = CvCamera(width=WINDOW, height=WINDOW, f_x=cam.f_x, f_y=cam.f_y,
                       c_x=cam.c_x - x0, c_y=cam.c_y - y0, s=cam.s,
                       near=cam.near, far=cam.far)
    win = np.asarray(render_depth(mesh_dev[0], mesh_dev[1], win_cam,
                                  jnp.asarray(t, jnp.float32),
                                  jnp.asarray(q, jnp.float32)))
    full = np.full((cam.height, cam.width), np.inf, np.float32)
    full[y0:y0 + WINDOW, x0:x0 + WINDOW] = np.where(win > 0, win, np.inf)
    return full


def background_depth(cam, rng, base_t, diam):
    """Structured background: a tilted support plane passing just BEHIND the
    object cluster plus a far wall, with low-frequency height variation.
    Replaces the easy profile's flat 1.5 m plane: near the object silhouette
    the background depth is within ~0.1-0.3 m of the object itself, so the
    pixel association cannot separate object from background by depth gap
    alone (real tabletop scenes — the reference's lm/tless — look exactly
    like this)."""
    import numpy as np

    uu, vv = np.meshgrid(np.arange(cam.width), np.arange(cam.height))
    dx = (uu - cam.c_x) / cam.f_x
    dy = (vv - cam.c_y) / cam.f_y
    # plane through a point slightly below/behind the cluster, tilted like a
    # table seen from a shoulder camera (depth grows toward the image top)
    p0 = np.asarray(base_t) + np.asarray([0.0, 0.05, 0.35 * diam + 0.05])
    n = np.asarray([rng.uniform(-0.15, 0.15), -1.0, rng.uniform(-0.45, -0.25)])
    n /= np.linalg.norm(n)
    d = n @ p0
    denom = n[0] * dx + n[1] * dy + n[2]
    z_plane = np.where(np.sign(denom) == np.sign(d), d / denom, np.inf)
    z_plane = np.where(z_plane > 0.3, z_plane, np.inf)
    # far wall behind the table horizon
    bg = np.minimum(z_plane, base_t[2] + 0.9)
    # low-frequency surface variation (boxes/cloth on the table)
    wobble = np.zeros_like(bg)
    for _ in range(6):
        fu, fv = rng.uniform(1.5, 8, 2)
        ph = rng.uniform(0, 2 * np.pi, 2)
        wobble += rng.uniform(0.002, 0.012) * np.sin(
            fu * dx * 3 + ph[0]) * np.sin(fv * dy * 3 + ph[1])
    return (bg + wobble).astype(np.float32)


def apply_sensor_artifacts(depth, rng):
    """Kinect-style degradation (the reference's real operating input):
    depth-dependent axial noise, dropout at silhouette/steep-gradient pixels,
    random speckle holes, 1 mm quantization. 0 = invalid."""
    import numpy as np

    z = depth.copy()
    valid = z > 0
    # axial noise grows quadratically with distance (structured-light model)
    sigma = 0.0012 + 0.0019 * np.maximum(z - 0.4, 0.0) ** 2
    z = np.where(valid, z + rng.normal(0, 1, z.shape) * sigma, 0.0)
    # silhouette dropout: strong local depth discontinuities shadow the
    # projector -> invalid pixels along object edges (dilated 1 px)
    gy, gx = np.gradient(np.where(valid, z, np.nan))
    grad = np.maximum(np.abs(gx), np.abs(gy))
    edge = ~np.isfinite(grad) | (grad > 0.02)
    edge = edge & valid
    grow = edge.copy()
    grow[1:] |= edge[:-1]
    grow[:-1] |= edge[1:]
    grow[:, 1:] |= edge[:, :-1]
    grow[:, :-1] |= edge[:, 1:]
    drop = grow & (rng.random(z.shape) < 0.8)
    z = np.where(drop, 0.0, z)
    # speckle holes: small disks of missing returns (shiny/absorbing spots)
    uu, vv = np.meshgrid(np.arange(z.shape[1]), np.arange(z.shape[0]))
    for _ in range(40):
        cx, cy = rng.uniform(0, z.shape[1]), rng.uniform(0, z.shape[0])
        r = rng.uniform(1.0, 3.5)
        z[(uu - cx) ** 2 + (vv - cy) ** 2 < r * r] = 0.0
    # 1 mm quantization happens at PNG write time (depth_scale = 1.0)
    return z


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/bop")
    ap.add_argument("--profile", choices=["easy", "cad", "hard"], default="easy",
                    help="hard: the pinned failure mode — sphere-behind-"
                         "sphere at visib~0.45, where the rear instance's "
                         "posterior genuinely prefers the occluder's mode "
                         "(r2 VERDICT missing #3)")
    ap.add_argument("--dataset", default=None,
                    help="default: synth (easy/hard) / synthcad (cad)")
    ap.add_argument("--split", default=None)
    ap.add_argument("--n-scenes", type=int, default=None)
    ap.add_argument("--n-images", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scene-offset", type=int, default=0,
                    help="first scene id minus 1 — append scenes to an "
                         "existing split without regenerating it (pass a "
                         "fresh --seed or the new scenes repeat the old "
                         "draws)")
    ap.add_argument("--visib-targets", type=float, nargs="+", default=[0.45],
                    help="hard profile: per-image target visibility of the "
                         "rear instance, cycled over images — a sweep like "
                         "0.15 0.25 0.35 0.45 0.55 makes the hard split a "
                         "recall-vs-visibility measurement instead of a "
                         "single pinned point")
    ap.add_argument("--multi-instance", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="two partially-occluding instances on even images")
    args = ap.parse_args()
    hard = args.profile == "hard"
    if args.dataset is None:
        args.dataset = "synthcad" if args.profile == "cad" else "synth"
    if args.split is None:
        args.split = "hard" if hard else "val"
    if args.n_scenes is None:
        args.n_scenes = {"easy": 1, "cad": 4, "hard": 1}[args.profile]
    if args.n_images is None:
        args.n_images = {"easy": 8, "cad": 12, "hard": 6}[args.profile]

    import imageio.v3 as iio
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bayesianposeestimation.jl_tpu import quaternions as quat
    from bayesianposeestimation.jl_tpu.camera import CvCamera
    from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth
    from bayesianposeestimation.jl_tpu.utils import mesh_io

    cad = args.profile == "cad"
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
    depth_scale = 1.0 if cad else 0.1  # mm per png unit (cad: 1 mm quantization)

    objects = build_objects(args.profile)
    models_info = {}
    for obj_id, mesh in objects.items():
        # BOP models are in millimeters; cad profile writes the real-world
        # format (binary_little_endian) at reference scale (10^5 faces)
        mm = mesh_io.Mesh(mesh.vertices * 1000.0, mesh.faces)
        mesh_io.save_ply(str(models_dir / f"obj_{obj_id:06d}.ply"), mm,
                         binary=cad)
        models_info[str(obj_id)] = {"diameter": mesh_io.mesh_diameter(mesh) * 1000.0}
    (models_dir / "models_info.json").write_text(json.dumps(models_info))
    print({k: f"{objects[int(k)].n_faces} faces" for k in models_info})

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    clutter_lib = make_clutter_library(rng) if cad else []
    dev_meshes = {oid: (jnp.asarray(m.vertices), jnp.asarray(m.faces))
                  for oid, m in objects.items()}
    clutter_dev = [(jnp.asarray(m.vertices), jnp.asarray(m.faces))
                   for m in clutter_lib]

    targets = []
    for scene_id in range(args.scene_offset + 1,
                          args.scene_offset + args.n_scenes + 1):
        sdir = split_dir / f"{scene_id:06d}"
        (sdir / "depth").mkdir(parents=True, exist_ok=True)
        (sdir / "mask_visib").mkdir(exist_ok=True)
        cams, gts, infos = {}, {}, {}
        for img_id in range(args.n_images):
            if hard:
                obj_id = 3  # the icosphere: both modes are rotationally alike
            else:
                obj_id = 1 + (img_id % len(objects))
            mesh = objects[obj_id]
            diam = float(models_info[str(obj_id)]["diameter"]) / 1000.0
            n_inst = 2 if (hard or (args.multi_instance and img_id % 2 == 0)) else 1
            inst_t, inst_q = [], []
            base_t = np.asarray([rng.uniform(-0.05, 0.05), rng.uniform(-0.04, 0.04),
                                 rng.uniform(0.8, 1.2)])
            for i in range(n_inst):
                key, kq = jax.random.split(key)
                inst_q.append(np.asarray(quat.rand_quaternion(kq)))
                if i == 0:
                    inst_t.append(base_t)
                elif hard:
                    inst_t.append(None)  # placed by the visibility search below
                else:
                    # behind + laterally shifted by ~40% of the object extent
                    # -> partial occlusion of the rear instance
                    off = np.asarray([rng.choice([-1, 1]) * 0.4 * diam,
                                      rng.uniform(-0.1, 0.1) * diam,
                                      rng.uniform(0.3, 0.6) * diam])
                    inst_t.append(base_t + off)

            def solo(t, q):
                x0, y0 = window_origin(cam, t)
                return render_solo(dev_meshes[obj_id], cam, t, q, x0, y0)

            if hard:
                # deterministic search: lateral offset of the rear sphere so
                # its visibility lands nearest this image's target (default
                # the pinned ~0.45 — the regime where the occluder's mode
                # out-scores the true one; a sweep covers 0.15-0.6)
                target_visib = args.visib_targets[img_id % len(args.visib_targets)]
                front = solo(inst_t[0], inst_q[0])
                side = rng.choice([-1, 1])
                behind = 0.45 * diam
                best = None
                for lat in np.arange(0.02, 0.64, 0.04):
                    t_rear = base_t + np.asarray([side * lat * diam, 0.0, behind])
                    rear = solo(t_rear, inst_q[1])
                    rendered = np.isfinite(rear)
                    vis = rendered & (rear <= np.minimum(front, rear) + 1e-3)
                    visib = vis.sum() / max(rendered.sum(), 1)
                    if best is None or abs(visib - target_visib) < abs(
                            best[0] - target_visib):
                        best = (visib, t_rear, rear)
                inst_t[1] = best[1]
                solos = [front, best[2]]
            else:
                # per-instance solo renders at native pixel density
                solos = [solo(t, q) for t, q in zip(inst_t, inst_q)]

            # unannotated clutter IN FRONT of the target cluster, clipping
            # its silhouette (cad profile only)
            clutter_solos = []
            if cad:
                for _ in range(rng.integers(2, 5)):
                    ci = int(rng.integers(0, len(clutter_lib)))
                    cdiam = mesh_io.mesh_diameter(clutter_lib[ci])
                    side = rng.choice([-1, 1])
                    off = np.asarray([
                        side * rng.uniform(0.35, 0.7) * (diam + cdiam) / 2,
                        rng.uniform(-0.4, 0.6) * diam,
                        -rng.uniform(0.12, 0.3)])
                    ct = base_t + off
                    key, kq = jax.random.split(key)
                    cq = np.asarray(quat.rand_quaternion(kq))
                    x0, y0 = window_origin(cam, ct)
                    clutter_solos.append(
                        render_solo(clutter_dev[ci], cam, ct, cq, x0, y0))

            obj_stack = np.stack(solos + clutter_solos)  # inf = background
            obj_min = obj_stack.min(0)

            if cad:
                bg = background_depth(cam, rng, base_t, diam)
                # objects composite OVER the background (the plane passes
                # close behind them; letting it occlude would invalidate the
                # object-only visib_fract annotations)
                composite = np.where(np.isfinite(obj_min), obj_min, bg)
                noisy = apply_sensor_artifacts(
                    np.where(np.isfinite(composite), composite, 0.0), rng)
            else:
                depth = np.where(np.isfinite(obj_min), obj_min, 0.0)
                noise = rng.normal(0, 0.003, depth.shape)
                noisy = np.where(depth > 0, depth + noise, 0.0)
                # background plane at 1.5 m for realism
                noisy = np.where(noisy == 0, 1.5 + rng.normal(0, 0.003, depth.shape), noisy)
            png = np.clip(noisy * 1000.0 / depth_scale, 0, 65535).astype(np.uint16)
            iio.imwrite(sdir / "depth" / f"{img_id:06d}.png", png)

            gt_list, info_list = [], []
            for gt_id, (t, q, solo) in enumerate(zip(inst_t, inst_q, solos)):
                # visible = this instance wins the object z-buffer (1 mm tol);
                # occlusion counts OBJECTS (incl. clutter), not background
                rendered = np.isfinite(solo)
                visible = rendered & (solo <= obj_min + 1e-3)
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

            cams[str(img_id)] = {"cam_K": K, "depth_scale": depth_scale}
            gts[str(img_id)] = gt_list
            infos[str(img_id)] = info_list
            targets.append({"im_id": img_id, "inst_count": n_inst, "obj_id": obj_id,
                            "scene_id": scene_id})
            print(f"  scene {scene_id} img {img_id}: obj {obj_id} x{n_inst}"
                  + (f" + {len(clutter_solos)} clutter" if cad else "")
                  + f", visib {[round(i['visib_fract'], 2) for i in info_list]}")
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
          f"profile={args.profile}, multi_instance={args.multi_instance})")


if __name__ == "__main__":
    main()
