"""Steri/ITODD-style second-dataset benchmark sweep.

Parity target: /root/reference/scripts/smc_benchmark_steri.jl — the same
recall-vs-compute sweep as smc_benchmark.jl, run on a dataset evaluated with
the stricter ITODD visibility tolerance (ITODD_DELTA = 5 mm instead of
BOP_DELTA = 15 mm; dispatch on the dataset name in evaluate_scene, parity
/root/reference/src/Evaluation.jl:196).

Generates a dedicated ``synth_steri`` synthetic dataset on demand (the name
triggers the ITODD_DELTA path), then delegates to the smc_benchmark sweep.

    python scripts/smc_benchmark_steri.py --scenes 1
"""

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    root = Path(__file__).resolve().parent
    dataset = "synth_steri"
    if not (Path("data/bop") / dataset / "val").exists():
        print(f"generating {dataset} dataset...")
        subprocess.run(
            [sys.executable, str(root / "make_synthetic_bop.py"),
             "--dataset", dataset, "--seed", "7"],
            check=True)
    args = sys.argv[1:]
    if "--dataset" not in args:
        args = ["--dataset", dataset] + args
    if "--experiment-name" not in args:
        args += ["--experiment-name", "smc_benchmark_steri"]
    subprocess.run(
        [sys.executable, str(root / "smc_benchmark.py")] + args, check=True)


if __name__ == "__main__":
    main()
