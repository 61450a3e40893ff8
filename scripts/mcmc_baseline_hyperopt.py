"""Hyperparameter search for the MCMC baselines (MH / MTM).

Parity target: /root/reference/scripts/mcmc_baseline_hyperopt.jl — the same
search space and cost (1 - VSD recall) as the SMC hyperopt, applied to the
MH and MTM samplers. (The reference's mcmc_mh_hyperopt.jl per-dataset variant
is documented as "Was not used" and is subsumed by --sampler/--dataset here.)

    python scripts/mcmc_baseline_hyperopt.py --trials 4 --scenes 1
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
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--samplers", nargs="+", default=["mh_sampler", "mtm_sampler"])
    args = ap.parse_args()

    import smc_mh_hyperopt

    for sampler in args.samplers:
        print(f"=== hyperopt: {sampler}")
        sys.argv = [sys.argv[0],
                    "--bop-dir", args.bop_dir, "--dataset", args.dataset,
                    "--testset", args.testset,
                    "--scenes", *[str(s) for s in args.scenes],
                    "--trials", str(args.trials),
                    "--sampler", sampler,
                    "--n-particles", "10",
                    "--experiment-name", f"mcmc_hyperopt_{sampler}"]
        smc_mh_hyperopt.main()


if __name__ == "__main__":
    main()
