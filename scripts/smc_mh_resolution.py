"""Crop-resolution sweep for SMC-MH: recall and step time vs image size.

Parity target: /root/reference/scripts/smc_mh_resolution.jl — sweeps the crop
resolution (2..100 px) at either a fixed time budget (mode=time: fewer pixels
=> faster steps => more steps) or a fixed step count (mode=steps), and records
recall + step time per resolution (smc_mh_resolution.jl:33-41).

    python scripts/smc_mh_resolution.py --resolutions 15 30 60 --scenes 1
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
    ap.add_argument("--resolutions", type=int, nargs="+",
                    default=[2, 5, 10, 15, 20, 25, 30, 40, 50, 75, 100])
    ap.add_argument("--mode", default="time", choices=["time", "steps"])
    ap.add_argument("--n-steps", type=int, default=200,
                    help="step count for mode=steps")
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
        n_steps=args.n_steps,
        pixel_sigma=0.005, association_sigma=0.005, o_mask_is=0.9,
        proposal_sigma_r=(np.pi, np.pi, np.pi),
    )
    name = "smc_mh_resolution"
    configs = dict_list({
        "sampler": "smc_mh", "dataset": args.dataset, "testset": args.testset,
        "scene_id": list(args.scenes), "mode": args.mode,
        "resolution": list(args.resolutions),
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
            resolution=config["resolution"], mode=config["mode"],
            scene_id=config["scene_id"],
            n_steps=int(result["n_steps"]),
            step_time=float(result["step_time"]),
            adds_recall=ev.recall(*ev.threshold_errors(errors["adds"],
                                                       ev.ADDS_THETA)),
            vsd_recall=ev.recall(*ev.threshold_errors(errors["vsd"],
                                                      ev.BOP18_THETA)),
            vsdbop_recall=ev.recall(*ev.threshold_errors(
                errors["vsdbop"], np.asarray(ev.BOP19_THRESHOLDS))),
        ))
        print(f"  -> res {config['resolution']}: VSD recall "
              f"{rows[-1]['vsd_recall']:.3f} ({rows[-1]['n_steps']} steps)")

    out_dir = datadir("exp_pro", name)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame(rows)
    df.to_csv(out_dir / "resolution_recall.csv", index=False)
    print(df.to_string(index=False))

    from bayesianposeestimation.jl_tpu.utils.visualization import diss_defaults, _plt
    diss_defaults()
    plt = _plt()
    Path("plots").mkdir(exist_ok=True)
    agg = df.groupby("resolution").agg(
        vsd_recall=("vsd_recall", "mean"), step_time=("step_time", "mean"))
    fig, ax1 = plt.subplots(figsize=(5, 3.2))
    ax1.plot(agg.index, agg.vsd_recall, "o-", label="VSD recall")
    ax1.set_xlabel("crop resolution [px]")
    ax1.set_ylabel("VSD recall")
    ax2 = ax1.twinx()
    ax2.plot(agg.index, agg.step_time * 1e3, "s--", color="tab:orange",
             label="step time")
    ax2.set_ylabel("step time [ms]")
    fig.tight_layout()
    fig.savefig("plots/smc_mh_resolution.pdf")
    print(f"wrote {out_dir/'resolution_recall.csv'} and plots/smc_mh_resolution.pdf")


if __name__ == "__main__":
    main()
