#!/bin/bash
# Round-5 TPU work queue — the remainder of the round-4 plan (see CLAUDE.md
# "Round-4 -> round-5 handoff"). Start this FIRST THING in round 5; every
# step resumes from produce_or_load caches, so re-runs only compute what is
# missing. Steps retry through axon tunnel wedges (CLAUDE.md recipe).
#
#   bash scripts/tpu_queue_r5.sh [step...]   # default: all steps in order
#
# Steps:
#   cadval    grow smc_bop_cad from the banked 3 val scenes to all 18
#             (complete passes over growing scene sets — a kill at any
#             point leaves the last completed pass's CSV standing)
#   hardvis   recall-vs-visibility artifact on the synth hardvis split
#   tracker   PF unmodeled-events artifacts (coordinate + bootstrap)
#   cropprof  raster-path decision matrix at 50 px (run on a QUIET chip;
#             feeds the 50 px >=100k hyp/s push or the ceiling analysis)
#   inftime   inference_time.csv refresh — run AFTER any kernel work
#
# After cadval completes 18 scenes: update the README accuracy bullet from
# data/exp_pro/smc_bop_cad/sampler_recall.csv (numbers + CIs).

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

retry() {  # retry <name> <timeout_s> <attempts> -- cmd...
  local name=$1 tmo=$2 tries=$3; shift 4
  for i in $(seq 1 "$tries"); do
    echo "=== [$name] attempt $i/$tries ($(date +%H:%M:%S)) ==="
    timeout "$tmo" "$@" && { echo "=== [$name] OK ==="; return 0; }
    echo "=== [$name] failed (rc=$?); sleeping 180s ==="
    sleep 180
  done
  echo "=== [$name] GAVE UP after $tries attempts ==="
  return 1
}

step_cadval() {
  # ~3.5 min per fresh (sampler, scene) config; cached configs replay in
  # seconds. Each pass rewrites sampler_recall.csv over its full scene set.
  bash scripts/cadval_ratchet.sh
}

step_hardvis() {
  retry hardvis 6000 3 -- python scripts/smc_bop_val.py --dataset synth \
    --testset hardvis --scenes 1 2 --samplers smc_mh mh_sampler mtm_sampler \
    --experiment-name hard_cases_vis
}

step_tracker() {
  retry trk_coord 3000 2 -- python scripts/ros_particle_filter.py \
    --filter coordinate --events \
    --out-json data/exp_pro/tracker/coordinate_events.json \
    --export-tum data/exp_pro/tracker/coordinate_events
  retry trk_boot 3000 2 -- python scripts/ros_particle_filter.py \
    --filter bootstrap --events \
    --out-json data/exp_pro/tracker/bootstrap_events.json \
    --export-tum data/exp_pro/tracker/bootstrap_events
}

step_cropprof() {
  retry cropprof 3000 2 -- python scripts/kernel_profile.py --crop 50
}

step_inftime() {
  retry inftime 6000 2 -- python scripts/inference_time.py
}

step_hyperopt() {
  # reference-depth searches (VERDICT r4 next #5): 50 trials per sampler,
  # independent seeds, 6-scene train split, val-replay tie-break. Traced
  # candidates share one compiled chain per (scene, object), so a trial
  # costs only sampling walltime.
  for S in smc_mh mh_sampler mtm_sampler; do
    retry "hyperopt_$S" 9000 2 -- python scripts/smc_mh_hyperopt.py \
      --dataset synthcad --testset train --scenes 1 2 3 4 5 6 --trials 50 \
      --sampler "$S" --experiment-name "hyperopt_cad_r5_$S" \
      --tiebreak-testset val --tiebreak-scenes 1 2 3
  done
}

step_budget() {
  # de-saturated budget sweep (VERDICT r4 next #6): synthcad scenes where
  # recall is off the ceiling, per-row CIs, budget_ok gate
  retry budget 9000 2 -- python scripts/smc_benchmark.py --dataset synthcad \
    --testset val --scenes 1 2 --experiment-name smc_benchmark_cad
}

steps=${@:-cadval hardvis tracker cropprof inftime hyperopt budget}
for s in $steps; do
  "step_$s" || echo "!!! step $s incomplete"
done
