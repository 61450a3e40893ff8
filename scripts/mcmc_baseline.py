"""MCMC baselines (MH / MTM) on the BOP pipeline.

Parity target: /root/reference/scripts/mcmc_baseline.jl — the MH/MTM chains
with burn-in and thinning against which the SMC sampler is compared.

    python scripts/mcmc_baseline.py --samplers mh_sampler mtm_sampler --scenes 1
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
    ap.add_argument("--samplers", nargs="+", default=["mh_sampler", "mtm_sampler"])
    ap.add_argument("--time-budget", type=float, default=0.5)
    # reference runs the MCMC baselines with 10 particles/tries
    # (mcmc_baseline.jl:43) — for MTM this is the try count
    ap.add_argument("--n-particles", type=int, default=10)
    args = ap.parse_args()

    sys.argv = [sys.argv[0],
                "--bop-dir", args.bop_dir, "--dataset", args.dataset,
                "--testset", args.testset,
                "--scenes", *[str(s) for s in args.scenes],
                "--samplers", *args.samplers,
                "--time-budget", str(args.time_budget),
                "--n-particles", str(args.n_particles),
                "--experiment-name", "mcmc_baseline"]
    import smc_bop_val

    smc_bop_val.main()


if __name__ == "__main__":
    main()
