#!/usr/bin/env bash
# Run the full experiment battery (parity: /root/reference/scripts/run.sh).
# Each stage caches its artifacts (produce_or_load), so re-runs resume.
set -euo pipefail
cd "$(dirname "$0")/.."

python scripts/make_synthetic_bop.py
python scripts/smc_bop_val.py --scenes 1
python scripts/mcmc_baseline.py --scenes 1
python scripts/smc_bop_test.py --scenes 1
python scripts/smc_benchmark.py --scenes 1 --particles 50 100 --budgets 0.25 0.5
python scripts/smc_mh_hyperopt.py --trials 30 --scenes 1
python scripts/inference_time.py --particles 10 100 500 --resolutions 25 50
python scripts/smc_observation.py --scenes 1 --variants association smooth simple --o-priors mask
python scripts/smc_priors.py --scenes 1
python scripts/smc_mh_resolution.py --scenes 1 --resolutions 15 30 60
python scripts/ros_particle_filter.py --filter coordinate --n-frames 120
# joint 7-DoF bootstrap needs more particles than the block-wise coordinate
# filter (the reference notes it 'tends to diverge', ExperimentSamplers.jl:122)
python scripts/ros_particle_filter.py --filter bootstrap --n-frames 120 --n-particles 2000
python scripts/demo_inference.py --fused
python bench.py
