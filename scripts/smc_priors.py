"""Prior ablation: point prior vs segmentation mask vs both.

Parity target: /root/reference/scripts/smc_priors.jl — compares three
translation/association prior sources (smc_priors.jl:36-64):

  point       gt position + 5mm noise (RFID-tag style), flat o = o_mask_is
  mask        3D point from the segmentation mask, per-pixel mask o-prior
  point_mask  noisy gt position + per-pixel mask o-prior

    python scripts/smc_priors.py --scenes 1
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
    ap.add_argument("--scenes", type=int, nargs="+", default=[1])
    ap.add_argument("--priors", nargs="+", default=["point", "mask", "point_mask"],
                    choices=["point", "mask", "point_mask"])
    ap.add_argument("--time-budget", type=float, default=0.5)
    ap.add_argument("--n-particles", type=int, default=100)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd

    import smc_bop_val
    from bayesianposeestimation.jl_tpu.parameters import Parameters
    from bayesianposeestimation.jl_tpu.utils import evaluation as ev
    from bayesianposeestimation.jl_tpu.utils.artifacts import (
        datadir, dict_list, produce_or_load, savename)

    parameters = Parameters(
        n_particles=args.n_particles, time_budget=args.time_budget,
        pixel_sigma=0.005, association_sigma=0.005, o_mask_is=0.9,
        proposal_sigma_r=(np.pi, np.pi, np.pi),
    )
    name = "smc_priors"
    configs = dict_list({
        "sampler": "smc_mh", "dataset": args.dataset, "testset": args.testset,
        "scene_id": list(args.scenes), "prior": list(args.priors),
    })

    rows = []
    for config in configs:
        print(f"config: {config}")
        result, _ = produce_or_load(
            lambda c: smc_bop_val.scene_inference(c, args.bop_dir, parameters),
            config, datadir("exp_raw", name), filename=savename(config))
        errors, _ = produce_or_load(
            lambda c: smc_bop_val.evaluate_scene(c, args.bop_dir, parameters,
                                                 result["result_rows"]),
            config, datadir("exp_pro", name, "errors"), filename=savename(config))
        rows.append(dict(
            prior=config["prior"], scene_id=config["scene_id"],
            adds_recall=ev.recall(*ev.threshold_errors(errors["adds"],
                                                       ev.ADDS_THETA)),
            vsd_recall=ev.recall(*ev.threshold_errors(errors["vsd"],
                                                      ev.BOP18_THETA)),
            vsdbop_recall=ev.recall(*ev.threshold_errors(
                errors["vsdbop"], np.asarray(ev.BOP19_THRESHOLDS))),
        ))
        print(f"  -> VSD recall {rows[-1]['vsd_recall']:.3f}")

    out_dir = datadir("exp_pro", name)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame(rows)
    df.to_csv(out_dir / "priors_recall.csv", index=False)
    print(df.to_string(index=False))
    print(f"wrote {out_dir/'priors_recall.csv'}")


if __name__ == "__main__":
    main()
