"""Step-time scaling study: particles x resolution (+ triangle count).

Parity target: /root/reference/scripts/inference_time.jl — step time vs
particle count (2..500) at 25/50/100 px (:31-43,69-84; the reference found a
3x step-time jump at ~350 particles from its layered-texture depth limit —
the TPU path has no such cliff, scaling is smooth in N).

    python scripts/inference_time.py
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, nargs="+",
                    default=[2, 10, 50, 100, 250, 500, 1000])
    ap.add_argument("--resolutions", type=int, nargs="+", default=[25, 50, 100])
    ap.add_argument("--mesh", default="monkey", choices=["cube", "monkey", "icosphere"])
    ap.add_argument("--csv", default="data/exp_pro/inference_time.csv")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bayesianposeestimation.jl_tpu import quaternions as quat
    from bayesianposeestimation.jl_tpu.camera import CvCamera, crop_camera
    from bayesianposeestimation.jl_tpu.models import experiment_samplers as es
    from bayesianposeestimation.jl_tpu.models.fused import fused_posterior
    from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth
    from bayesianposeestimation.jl_tpu.parameters import Experiment, Parameters
    from bayesianposeestimation.jl_tpu.utils import mesh_io
    from bayesianposeestimation.jl_tpu.utils.evaluation import mean_step_time

    mesh = {"cube": lambda: mesh_io.cube_mesh(0.1),
            "monkey": lambda: mesh_io.monkey_mesh(0.08),
            "icosphere": lambda: mesh_io.icosphere_mesh(0.05)}[args.mesh]()
    base = CvCamera(width=640, height=480, f_x=600.0, f_y=600.0, c_x=319.5,
                    c_y=239.5, near=0.01, far=10.0)
    key = jax.random.PRNGKey(0)
    rows = []
    for res in args.resolutions:
        params0 = Parameters(width=res, height=res,
                             proposal_sigma_r=(0.5, 0.5, 0.5))
        cam = crop_camera(base, np.array([0.0, 0.0, 1.0]),
                          mesh_io.mesh_diameter(mesh), width=res, height=res)
        scene = {"camera": cam, "verts": jnp.asarray(mesh.vertices),
                 "faces": jnp.asarray(mesh.faces)}
        gt_t = jnp.array([0.0, 0.0, 1.0])
        clean = render_depth(scene["verts"], scene["faces"], cam, gt_t,
                             quat.quat_identity(), height=res, width=res)
        exp = Experiment(scene=scene, prior_o=0.7, prior_t=gt_t,
                         depth_image=jnp.where(clean > 0, clean, 0.0))
        for n in args.particles:
            params = params0.replace(n_particles=n)
            posterior = fused_posterior(params, exp, "association")
            sampler = es.smc_mh(params, posterior)
            st = mean_step_time(key, posterior, sampler, n, max_seconds=0.5)
            rows.append(dict(resolution=res, n_particles=n,
                             step_time_ms=st * 1e3, hyp_per_s=n / st))
            print(f"res {res:4d} particles {n:5d}: {st*1e3:8.2f} ms/step "
                  f"-> {n/st:12,.0f} hyp/s")

    import pandas as pd

    # merge-by-key: a partial re-run (e.g. --resolutions 25 after kernel
    # work that only affects small crops) updates those rows in place and
    # keeps the rest of the checked-in table
    df = pd.DataFrame(rows)
    csv = Path(args.csv)
    if csv.exists():
        old = pd.read_csv(csv)
        keep = old[~(old.resolution.isin(df.resolution)
                     & old.n_particles.isin(df.n_particles))]
        df = pd.concat([keep, df], ignore_index=True).sort_values(
            ["resolution", "n_particles"])
    csv.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(csv, index=False)
    print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
