"""Process-level sweep runner: distribute configs across hosts/processes.

Parity+upgrade for the reference's sequential per-config loop
(/root/reference/scripts/run.sh:8-21 and the `for config in configs`
loops, SURVEY.md §2C 'process-level parallelism'): scene/config sweeps are
embarrassingly parallel, so they scale across hosts over DCN with no
communication — each worker claims a strided shard of the config list and
produce_or_load keeps completed work idempotent (crash-resumable).

Single-host usage (N worker processes, one TPU chip each via scheduling):

    run_sweep(fn, configs, out_dir)                 # this process, its shard
    WORKER=2 N_WORKERS=8 python script.py           # shard via environment
"""

from __future__ import annotations

import os

from ..utils.artifacts import produce_or_load, savename

__all__ = ["shard_configs", "run_sweep"]


def shard_configs(configs, worker: int | None = None, n_workers: int | None = None):
    """Strided shard of the config list for this worker (env WORKER/N_WORKERS
    by default; falls back to the whole list)."""
    worker = int(os.environ.get("WORKER", 0)) if worker is None else worker
    n_workers = int(os.environ.get("N_WORKERS", 1)) if n_workers is None else n_workers
    return configs[worker::n_workers]


def run_sweep(fn, configs, out_dir, worker=None, n_workers=None, log=print):
    """Run ``fn(config) -> dict`` for this worker's shard with artifact
    caching; returns the list of (config, result) pairs."""
    results = []
    shard = shard_configs(configs, worker, n_workers)
    for i, config in enumerate(shard):
        log(f"[sweep {i + 1}/{len(shard)}] {config}")
        result, path = produce_or_load(fn, config, out_dir, filename=savename(config))
        results.append((config, result))
    return results
