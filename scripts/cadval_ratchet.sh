#!/bin/bash
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
for S in "1 2 3" "1 2 3 4 5" "1 2 3 4 5 6 7" "1 2 3 4 5 6 7 8 9" \
         "1 2 3 4 5 6 7 8 9 10 11 12" "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15" \
         "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18"; do
  echo "=== PASS scenes [$S] ($(date +%H:%M:%S)) ==="
  timeout 4000 python scripts/smc_bop_val.py --dataset synthcad --testset val \
    --scenes $S --samplers smc_mh mh_sampler mtm_sampler \
    --experiment-name smc_bop_cad || { echo "=== PASS [$S] FAILED/TIMEOUT; retry once after 120s ==="; sleep 120; \
    timeout 4000 python scripts/smc_bop_val.py --dataset synthcad --testset val \
    --scenes $S --samplers smc_mh mh_sampler mtm_sampler \
    --experiment-name smc_bop_cad || echo "=== PASS [$S] gave up ==="; }
  echo "=== PASS [$S] done ($(date +%H:%M:%S)) ==="
done
