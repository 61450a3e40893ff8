"""Generative-model panels: observed / rendered / sampled / association.

Parity target: /root/reference/scripts/plot_depth_imgs.jl — visualizes the
pieces of the observation model for one BOP row: the measured depth crop, the
expected (rendered) depth at the ground-truth pose, a synthetic draw from the
per-pixel mixture z ~ pixel_mixture(mu, o), and the analytic association
probability (plot_depth_imgs.jl:20-60).

    python scripts/plot_depth_imgs.py
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
    ap.add_argument("--resolution", type=int, default=150)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bayesianposeestimation.jl_tpu import quaternions as quat
    from bayesianposeestimation.jl_tpu.camera import crop_camera, crop_image
    from bayesianposeestimation.jl_tpu.models import pixel as pixel_models
    from bayesianposeestimation.jl_tpu.models.experiment_models import (
        point_from_segmentation,
    )
    from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth_batch
    from bayesianposeestimation.jl_tpu.parameters import Parameters
    from bayesianposeestimation.jl_tpu.utils import bop
    from bayesianposeestimation.jl_tpu.utils.visualization import (
        diss_defaults,
        plot_depth_img,
        plot_prob_img,
        _plt,
    )

    parameters = Parameters(width=args.resolution, height=args.resolution)
    df = bop.bop_test_or_train(args.bop_dir, args.dataset, args.testset, args.scene)
    row = df.iloc[0]
    full_cam = bop.camera_for_row(row)
    full_depth = bop.load_depth_image(row)
    full_mask = bop.load_mask_image(row)
    diameter = bop.model_diameter(row)
    mesh = bop.load_mesh(row)
    ys, xs = np.nonzero(np.asarray(full_mask))
    bbox = (xs.min(), xs.max(), ys.min(), ys.max())
    prior_t = point_from_segmentation(bbox, full_depth, full_mask, full_cam)
    cam = crop_camera(full_cam, prior_t, diameter,
                      width=args.resolution, height=args.resolution)
    depth_crop = np.asarray(crop_image(full_depth, full_cam, cam))

    # expected image: render at the ground-truth pose
    gt_t = jnp.asarray(row.gt_t, jnp.float32)[None]
    gt_q = quat.matrix_to_quat(jnp.asarray(row.gt_R, jnp.float32))[None]
    mu = np.asarray(render_depth_batch(jnp.asarray(mesh.vertices),
                                       jnp.asarray(mesh.faces), cam,
                                       gt_t, gt_q)[0])

    # generated image: draw z ~ pixel_mixture(mu, o) per pixel
    key = jax.random.PRNGKey(8)
    dist = pixel_models.pixel_mixture(
        parameters.min_depth, parameters.max_depth,
        parameters.pixel_theta, parameters.pixel_sigma,
        jnp.asarray(mu), jnp.float32(1.0))
    gen = np.asarray(dist.sample(key))  # params are [H, W]-shaped already
    gen = np.where(mu > 0, gen, 0.0)

    # association probability o(prior=0.5, mu, z)
    assoc_fn = pixel_models.pixel_association_fn(parameters)
    o = np.asarray(assoc_fn(jnp.float32(0.5), jnp.asarray(mu),
                            jnp.asarray(depth_crop)))

    diss_defaults()
    plt = _plt()
    fig, axes = plt.subplots(1, 4, figsize=(11, 2.8))
    plot_depth_img(depth_crop, ax=axes[0], title="measured z")
    plot_depth_img(mu, ax=axes[1], title="expected mu (gt)")
    plot_depth_img(gen, ax=axes[2], title="generated z ~ p(z|mu,o=1)")
    plot_prob_img(o, ax=axes[3], title="association o")
    Path("plots").mkdir(exist_ok=True)
    fig.savefig("plots/depth_imgs.pdf", bbox_inches="tight")
    print("wrote plots/depth_imgs.pdf")


if __name__ == "__main__":
    main()
