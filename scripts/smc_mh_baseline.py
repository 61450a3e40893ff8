"""Quantitative SMC-MH baseline on synthetic data: simple posterior + point prior.

Parity target: /root/reference/scripts/smc_mh_baseline.jl — the baseline
configuration from "Quantitative Evaluation of Baseline Samplers on Synthetic
Data": smc_mh with the simple posterior (fixed o, simple regularization), a
noisy ground-truth point prior, and a flat scalar o=0.5
(smc_mh_baseline.jl:32-61).

    python scripts/smc_mh_baseline.py --scenes 1
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from smc_bop_val import evaluate_scene, scene_inference  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bop-dir", default="data/bop")
    ap.add_argument("--dataset", default="synth")
    ap.add_argument("--testset", default="val")
    ap.add_argument("--scenes", type=int, nargs="+", default=[1])
    ap.add_argument("--time-budget", type=float, default=0.5)
    ap.add_argument("--n-particles", type=int, default=100)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd

    from bayesianposeestimation.jl_tpu.parameters import Parameters
    from bayesianposeestimation.jl_tpu.utils import evaluation as ev
    from bayesianposeestimation.jl_tpu.utils.artifacts import (
        datadir, dict_list, produce_or_load, savename)

    parameters = Parameters(
        n_particles=args.n_particles, time_budget=args.time_budget,
        pixel_sigma=0.005, association_sigma=0.005, o_mask_is=0.9,
        proposal_sigma_r=(np.pi, np.pi, np.pi),
    )
    name = "smc_mh_baseline"
    configs = dict_list({
        "sampler": "smc_mh", "variant": "simple", "prior": "point",
        "o_prior": "flat", "dataset": args.dataset, "testset": args.testset,
        "scene_id": list(args.scenes),
    })

    rows = []
    for config in configs:
        print(f"config: {config}")
        result, _ = produce_or_load(
            lambda c: scene_inference(c, args.bop_dir, parameters),
            config, datadir("exp_raw", name), filename=savename(config))
        errors, _ = produce_or_load(
            lambda c: evaluate_scene(c, args.bop_dir, parameters,
                                     result["result_rows"]),
            config, datadir("exp_pro", name, "errors"), filename=savename(config))
        rows.append(dict(
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
    df.to_csv(out_dir / "baseline_recall.csv", index=False)
    print(df.to_string(index=False))
    print(f"wrote {out_dir/'baseline_recall.csv'}")


if __name__ == "__main__":
    main()
