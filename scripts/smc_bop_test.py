"""BOP test-set inference + submission CSV export.

Parity target: /root/reference/scripts/smc_bop_test.jl — per-detection
inference followed by the BOP challenge CSV format (:198-235):
scene_id,im_id,obj_id,score,R (9 floats row-major),t (mm),time — with the
per-image cumulative time convention (:215-218).

    python scripts/smc_bop_test.py --dataset synth --testset val --scenes 1
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from smc_bop_val import TUNED_PARAMETERS, scene_inference  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bop-dir", default="data/bop")
    ap.add_argument("--dataset", default="synth")
    ap.add_argument("--testset", default="val")
    ap.add_argument("--scenes", type=int, nargs="+", default=[1])
    ap.add_argument("--sampler", default="smc_mh")
    ap.add_argument("--time-budget", type=float, default=0.5)
    ap.add_argument("--n-particles", type=int, default=100)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    from bayesianposeestimation.jl_tpu import quaternions as quat
    from bayesianposeestimation.jl_tpu.parameters import Parameters
    from bayesianposeestimation.jl_tpu.utils.artifacts import (
        datadir,
        produce_or_load,
        savename,
    )

    # hyperopt-tuned parameters (see smc_bop_val.TUNED_PARAMETERS provenance)
    parameters = Parameters(
        n_particles=args.n_particles, time_budget=args.time_budget,
        **TUNED_PARAMETERS,
    )

    import jax.numpy as jnp

    lines = ["scene_id,im_id,obj_id,score,R,t,time"]
    for scene_id in args.scenes:
        config = {"sampler": args.sampler, "dataset": args.dataset,
                  "testset": args.testset, "scene_id": scene_id}
        result, _ = produce_or_load(
            lambda c: scene_inference(c, args.bop_dir, parameters),
            config, datadir("exp_raw", "smc_bop_test"), filename=savename(config))
        # per-image cumulative time (smc_bop_test.jl:215-218)
        by_img = {}
        for r in result["result_rows"]:
            by_img.setdefault(r["img_id"], []).append(r)
        for img_id, rows in by_img.items():
            img_time = sum(r["time"] for r in rows)
            for r in rows:
                R = np.asarray(quat.quat_to_matrix(jnp.asarray(r["q"], jnp.float32)))
                R_str = " ".join(f"{v:.9f}" for v in R.ravel())
                t_str = " ".join(f"{v * 1000.0:.6f}" for v in np.asarray(r["t"]))
                lines.append(
                    f"{r['scene_id']},{r['img_id']},{r['obj_id']},"
                    f"{r['score']:.6f},{R_str},{t_str},{img_time:.4f}")

    out = args.out or f"data/{args.sampler}_{args.dataset}-{args.testset}.csv"
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    Path(out).write_text("\n".join(lines) + "\n")
    print(f"wrote BOP submission CSV: {out} ({len(lines) - 1} estimates)")


if __name__ == "__main__":
    main()
