"""Visualize crop resolutions (qualitative-analysis figure).

Parity target: /root/reference/scripts/visualize_crop.jl — shows the same
object crop at increasing crop resolutions (visualize_crop.jl:18-33). The
synthetic dataset carries no color images, so the depth crop is shown.

    python scripts/visualize_crop.py
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
    ap.add_argument("--resolutions", type=int, nargs="+", default=[15, 30, 60])
    args = ap.parse_args()

    import numpy as np

    from bayesianposeestimation.jl_tpu.camera import crop_camera, crop_image
    from bayesianposeestimation.jl_tpu.models.experiment_models import (
        point_from_segmentation,
    )
    from bayesianposeestimation.jl_tpu.utils import bop
    from bayesianposeestimation.jl_tpu.utils.visualization import (
        diss_defaults,
        plot_depth_img,
        _plt,
    )

    df = bop.bop_test_or_train(args.bop_dir, args.dataset, args.testset, args.scene)
    row = df.iloc[0]
    full_cam = bop.camera_for_row(row)
    full_depth = bop.load_depth_image(row)
    full_mask = bop.load_mask_image(row)
    diameter = bop.model_diameter(row)
    ys, xs = np.nonzero(np.asarray(full_mask))
    bbox = (xs.min(), xs.max(), ys.min(), ys.max())
    prior_t = point_from_segmentation(bbox, full_depth, full_mask, full_cam)

    diss_defaults()
    plt = _plt()
    fig, axes = plt.subplots(1, len(args.resolutions),
                             figsize=(2.6 * len(args.resolutions), 2.8))
    for ax, res in zip(np.atleast_1d(axes), args.resolutions):
        cam = crop_camera(full_cam, prior_t, diameter, width=res, height=res)
        crop = crop_image(full_depth, full_cam, cam)
        plot_depth_img(np.asarray(crop), ax=ax, title=f"{res}x{res}")
    Path("plots").mkdir(exist_ok=True)
    fig.savefig("plots/crop_resolutions.pdf", bbox_inches="tight")
    print("wrote plots/crop_resolutions.pdf")


if __name__ == "__main__":
    main()
