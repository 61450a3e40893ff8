"""Experiment artifact caching & config sweeps (DrWatson.jl parity).

Rebuilds the thin DrWatson slice the reference's script layer runs on
(SURVEY.md §2B third-party row; call sites at
/root/reference/scripts/smc_bop_val.jl:45,167-169, /root/reference/src/Evaluation.jl:222-231):

* ``dict_list``: cartesian product of config values -> list of configs.
* ``savename``: stable "k=v,k=v" filename encoding (and its parser).
* ``produce_or_load``: run ``fn(config)`` unless the artifact file already
  exists — the reference's crash-resume mechanism at experiment granularity
  (SURVEY.md §5 'Checkpoint / resume').
* ``collect_results``: load every artifact in a directory.

Artifacts are numpy ``.npz`` files (pickled object arrays allowed) instead of
JLD2.
"""

from __future__ import annotations

import itertools
import json
import warnings
from pathlib import Path

import numpy as np

__all__ = ["dict_list", "savename", "parse_savename", "produce_or_load",
           "collect_results", "datadir"]

_DATA_ROOT = Path("data")


def datadir(*parts) -> Path:
    """data/<parts...> under the current project (parity: DrWatson.datadir)."""
    return _DATA_ROOT.joinpath(*parts)


def dict_list(config: dict) -> list:
    """Cartesian product over list-valued entries
    (parity: DrWatson.dict_list)."""
    keys = list(config.keys())
    value_lists = [v if isinstance(v, (list, tuple)) else [v] for v in config.values()]
    return [dict(zip(keys, combo)) for combo in itertools.product(*value_lists)]


def savename(config: dict, suffix: str = "", connector: str = ",") -> str:
    """Deterministic, sorted "k=v" encoding
    (parity: DrWatson.savename via Evaluation.jl:222-231)."""
    parts = []
    for k in sorted(config):
        v = config[k]
        if isinstance(v, float):
            v = f"{v:g}"
        parts.append(f"{k}={v}")
    name = connector.join(parts)
    return f"{name}.{suffix}" if suffix else name


def parse_savename(filename: str, connector: str = ",") -> dict:
    """Inverse of savename (without prefix/suffix) —
    parity: my_parse_savename at Evaluation.jl:253-259."""
    stem = Path(filename).name
    if "." in stem:
        stem = stem.rsplit(".", 1)[0]
    config = {}
    for part in stem.split(connector):
        if "=" not in part:
            continue
        k, v = part.split("=", 1)
        for cast in (int, float):
            try:
                v = cast(v)
                break
            except ValueError:
                continue
        config[k] = v
    return config


def canonical_signature(signature) -> str:
    """Stable string encoding of an effective-parameter signature (sorted
    keys, tuples→lists) so equality survives the npz round trip."""
    return json.dumps(signature, sort_keys=True, default=lambda v: list(v)
                      if isinstance(v, (tuple, set)) else repr(v))


def produce_or_load(fn, config: dict, directory, filename=None, force=False,
                    signature=None) -> tuple:
    """Run ``fn(config) -> dict`` unless the artifact exists; returns
    (result_dict, path) (parity: DrWatson.@produce_or_load at
    scripts/smc_bop_val.jl:167-169).

    ``signature``: dict of effective parameters that the cache key (filename)
    does NOT encode — e.g. tuned hyperparameters, n_particles, time budget.
    A cached artifact whose stored ``__signature__`` differs (or is absent)
    is stale and gets recomputed, so re-tuning parameters between rounds can
    never silently mix operating points in one aggregate CSV."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    name = filename if filename is not None else savename(config)
    path = directory / f"{name}.npz"
    sig = canonical_signature(signature) if signature is not None else None
    if path.exists() and not force:
        data = load_artifact(path)
        stored = data.get("__signature__")
        if isinstance(stored, np.ndarray):
            stored = stored.item()
        if sig is None or stored == sig:
            return data, path
        warnings.warn(f"stale artifact {path.name}: stored signature "
                      f"{stored!r} != requested {sig!r}; recomputing")
    result = fn(config)
    extra = {"__config__": config}
    if sig is not None:
        extra["__signature__"] = sig
    save_artifact(path, {**result, **extra})
    return result, path


def save_artifact(path, data: dict):
    np.savez_compressed(path, **{k: np.asarray(v, dtype=object) if _is_object(v) else v
                                 for k, v in data.items()})


def _is_object(v):
    try:
        arr = np.asarray(v)
        return arr.dtype == object
    except Exception:
        return True


def load_artifact(path) -> dict:
    with np.load(path, allow_pickle=True) as f:
        out = {}
        for k in f.files:
            v = f[k]
            if v.dtype == object and v.ndim == 0:
                v = v.item()
            out[k] = v
        return out


def collect_results(directory) -> list:
    """Load all artifacts of a directory with their parsed configs
    (parity: DrWatson.collect_results at Evaluation.jl:248-251)."""
    directory = Path(directory)
    results = []
    for path in sorted(directory.glob("*.npz")):
        data = load_artifact(path)
        data.setdefault("__config__", parse_savename(path.name))
        data["__path__"] = str(path)
        results.append(data)
    return results
