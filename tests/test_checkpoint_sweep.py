"""Checkpoint save/restore and sweep sharding."""

import jax.numpy as jnp
import numpy as np

from bayesianposeestimation.jl_tpu.parallel.sweep import run_sweep, shard_configs
from bayesianposeestimation.jl_tpu.samplers.smc import SmcState
from bayesianposeestimation.jl_tpu.samples import Sample
from bayesianposeestimation.jl_tpu.utils.checkpoint import load_state, save_state


def test_checkpoint_roundtrip(tmp_path):
    state = SmcState(
        Sample({"t": jnp.ones((4, 3)), "r": jnp.ones((4, 4))},
               jnp.zeros(4), jnp.zeros(4)),
        jnp.full((4,), -jnp.log(4.0)), jnp.float32(1.5), jnp.float32(0.5),
        jnp.float32(-0.1),
    )
    path = tmp_path / "state.npz"
    save_state(path, state)
    restored = load_state(path, state)
    assert isinstance(restored, SmcState)
    np.testing.assert_allclose(restored.sample.variables["t"], 1.0)
    np.testing.assert_allclose(float(restored.log_evidence), 1.5)


def test_shard_configs():
    configs = list(range(10))
    shards = [shard_configs(configs, w, 3) for w in range(3)]
    assert sorted(sum(shards, [])) == configs
    assert shards[0] == [0, 3, 6, 9]


def test_run_sweep_caches(tmp_path):
    calls = []

    def fn(config):
        calls.append(config)
        return {"v": np.asarray([config["x"]])}

    configs = [{"x": i} for i in range(4)]
    out = run_sweep(fn, configs, tmp_path, worker=0, n_workers=2, log=lambda *a: None)
    assert len(out) == 2 and len(calls) == 2
    out2 = run_sweep(fn, configs, tmp_path, worker=0, n_workers=2, log=lambda *a: None)
    assert len(calls) == 2  # cached
