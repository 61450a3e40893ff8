"""Hyperparameter search for the SMC-MH sampler.

Parity target: /root/reference/scripts/smc_mh_hyperopt.jl — HyperTuning's
BCAPSampler over o_mask_is in [0.5,1], pixel_sigma in [1e-4,0.02],
proposal_sigma_r in [0.01,pi], minimizing 1 - VSD recall (:182-204, cost at
:91-156). Here: quasi-random (scrambled Halton-ish) search with the same
bounds and objective; the reference's tuned optimum (pixel_sigma=0.005,
o_mask_is=0.9, sigma_r=pi; smc_bop_val.jl:36-39) is included as the first
candidate.

    python scripts/smc_mh_hyperopt.py --trials 8 --scenes 1
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from smc_bop_val import evaluate_scene, scene_inference  # noqa: E402


def sample_candidates(n, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    cands = [dict(o_mask_is=0.9, pixel_sigma=0.005, sigma_r=float(np.pi))]
    for _ in range(n - 1):
        cands.append(dict(
            o_mask_is=float(rng.uniform(0.5, 1.0)),
            pixel_sigma=float(10 ** rng.uniform(-4, np.log10(0.02))),
            sigma_r=float(rng.uniform(0.01, np.pi)),
        ))
    return cands


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bop-dir", default="data/bop")
    ap.add_argument("--dataset", default="synth")
    ap.add_argument("--testset", default="val")
    ap.add_argument("--scenes", type=int, nargs="+", default=[1])
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--time-budget", type=float, default=0.25)
    ap.add_argument("--n-particles", type=int, default=100)
    args = ap.parse_args()

    import numpy as np

    from bayesianposeestimation.jl_tpu.parameters import Parameters
    from bayesianposeestimation.jl_tpu.utils import evaluation as ev
    from bayesianposeestimation.jl_tpu.utils.artifacts import (
        datadir,
        produce_or_load,
        savename,
    )

    best = (1.0, None)
    rows = []
    for trial, cand in enumerate(sample_candidates(args.trials)):
        parameters = Parameters(
            n_particles=args.n_particles, time_budget=args.time_budget,
            pixel_sigma=cand["pixel_sigma"], association_sigma=cand["pixel_sigma"],
            o_mask_is=cand["o_mask_is"],
            proposal_sigma_r=(cand["sigma_r"],) * 3, raster_chunk=64,
        )
        costs = []
        for scene_id in args.scenes:
            config = {"sampler": "smc_mh", "dataset": args.dataset,
                      "testset": args.testset, "scene_id": scene_id,
                      "trial": trial}
            result, _ = produce_or_load(
                lambda c: scene_inference(c, args.bop_dir, parameters),
                config, datadir("exp_raw", "smc_mh_hyperopt"), filename=savename(config))
            errors, _ = produce_or_load(
                lambda c: evaluate_scene(c, args.bop_dir, parameters,
                                         result["result_rows"]),
                config, datadir("exp_pro", "smc_mh_hyperopt", "errors"),
                filename=savename(config))
            vsd_rec = ev.recall(*ev.threshold_errors(errors["vsd"], ev.BOP18_THETA))
            costs.append(1.0 - vsd_rec)
        cost = float(np.mean(costs))
        rows.append(dict(trial=trial, **cand, cost=cost))
        print(f"trial {trial}: {cand} -> cost {cost:.3f}")
        if cost < best[0]:
            best = (cost, cand)

    import pandas as pd

    out = datadir("exp_pro", "smc_mh_hyperopt", "trials.csv")
    out.parent.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(rows).to_csv(out, index=False)
    print(f"best: cost {best[0]:.3f} with {best[1]}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
