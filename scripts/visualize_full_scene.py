"""Full-scene overlay: ground-truth pose rendered over the full frame.

Parity target: /root/reference/scripts/visualize_full_scene.jl — renders the
object at its ground-truth pose at full frame resolution and overlays it on
the camera image (visualize_full_scene.jl:18-38). The synthetic dataset has
no color stream, so the overlay is on the measured depth image.

    python scripts/visualize_full_scene.py
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bop-dir", default="data/bop")
    ap.add_argument("--dataset", default="synth")
    ap.add_argument("--testset", default="val")
    ap.add_argument("--scene", type=int, default=1)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from bayesianposeestimation.jl_tpu import quaternions as quat
    from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth_batch
    from bayesianposeestimation.jl_tpu.utils import bop
    from bayesianposeestimation.jl_tpu.utils.visualization import (
        diss_defaults,
        plot_scene_ontop,
        _plt,
    )

    df = bop.bop_test_or_train(args.bop_dir, args.dataset, args.testset, args.scene)
    row = df.iloc[0]
    cam = bop.camera_for_row(row)
    depth = np.asarray(bop.load_depth_image(row))
    mesh = bop.load_mesh(row, decimate_to=2000)
    gt_t = jnp.asarray(row.gt_t, jnp.float32)[None]
    gt_q = quat.matrix_to_quat(jnp.asarray(row.gt_R, jnp.float32))[None]
    render = np.asarray(render_depth_batch(jnp.asarray(mesh.vertices),
                                           jnp.asarray(mesh.faces), cam,
                                           gt_t, gt_q)[0])

    diss_defaults()
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4.5))
    plot_scene_ontop(depth, render, ax=ax)
    Path("plots").mkdir(exist_ok=True)
    fig.savefig("plots/full_scene.pdf", bbox_inches="tight")
    print("wrote plots/full_scene.pdf")


if __name__ == "__main__":
    main()
