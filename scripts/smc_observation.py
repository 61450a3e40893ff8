"""Observation-model ablation: exponential tail / classification / regularization.

Parity target: /root/reference/scripts/smc_observation.jl — sweeps the pixel
mixture (:exp vs :smooth), the analytic association (classification) and the
image regularization, crossed with a flat vs segmentation-mask o-prior
(smc_observation.jl:37-48,105-120).

Mapping onto this framework's fused posterior variants
(bayesianposeestimation/jl_tpu/models/fused.py):

  reference (pixel, classification)  ->  variant
  (exp,    class)                        association        (L0 normalizer)
  (exp,    simple)                       association_simple_reg
  (exp,    no)                           simple
  (smooth, class)                        smooth
  (smooth, simple)                       smooth_simple_reg
  (smooth, no)                           smooth_simple
  (no_exp, no)                           no_exp
  (no_exp, simple/class)                 no_exp_association

    python scripts/smc_observation.py --scenes 1
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VARIANTS = ["association", "association_simple_reg", "simple",
            "smooth", "smooth_simple_reg", "smooth_simple",
            "no_exp", "no_exp_association"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bop-dir", default="data/bop")
    ap.add_argument("--dataset", default="synth")
    ap.add_argument("--testset", default="val")
    ap.add_argument("--scenes", type=int, nargs="+", default=[1])
    ap.add_argument("--variants", nargs="+", default=VARIANTS, choices=VARIANTS)
    ap.add_argument("--o-priors", nargs="+", default=["mask", "flat"],
                    choices=["mask", "flat"])
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
    name = "smc_observation"
    configs = dict_list({
        "sampler": "smc_mh", "dataset": args.dataset, "testset": args.testset,
        "scene_id": list(args.scenes), "variant": list(args.variants),
        "o_prior": list(args.o_priors),
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
            variant=config["variant"], o_prior=config["o_prior"],
            scene_id=config["scene_id"],
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
    df.to_csv(out_dir / "observation_recall.csv", index=False)
    print(df.to_string(index=False))
    print(f"wrote {out_dir/'observation_recall.csv'}")


if __name__ == "__main__":
    main()
