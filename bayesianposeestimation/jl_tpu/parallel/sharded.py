"""Multi-chip scale-out: shard the particle axis over a device mesh.

This is NEW capability relative to the reference, which is single-process /
single-GPU (SURVEY.md §2C: no DP/TP/PP, no NCCL — OpenGL is explicitly
sequential). The TPU-native scale-out axis is the particle batch:

* each chip renders + scores its particle shard (embarrassingly parallel —
  the fused render/score program partitions cleanly along the pose axis);
* weight normalization, log-evidence (logsumexp), and ESS are global
  reductions — XLA inserts psum/all-gather collectives over ICI from the
  sharding annotations (GSPMD); nothing is hand-scheduled;
* systematic resampling gathers across shards — an all-gather-sized
  collective of just [N, 7] floats (t, r), negligible on ICI.

Design per the scaling-book recipe: pick a mesh, annotate in/out shardings on
the *whole chain step*, let the compiler place collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["particle_mesh", "shard_state", "sharded_sample_chain"]

PARTICLE_AXIS = "particles"


def particle_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the particle axis."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    return Mesh(np.asarray(devices[:n]).reshape(n), (PARTICLE_AXIS,))


def _spec_for(x, mesh):
    # shard leading (particle) axis of batched arrays; replicate scalars
    if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % mesh.devices.size == 0:
        return NamedSharding(mesh, P(PARTICLE_AXIS, *([None] * (x.ndim - 1))))
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh):
    """Place a sampler state pytree on the mesh (particle axis sharded)."""
    return jax.tree.map(lambda x: jax.device_put(x, _spec_for(x, mesh)), state)


def sharded_sample_chain(key, model, sampler, n_steps, n_particles, mesh: Mesh,
                         collect_vars=("t", "r")):
    """Run a chain with the particle axis sharded over the mesh.

    The same pure step function as the single-chip path is jitted under the
    mesh with sharded state in/out; GSPMD partitions the render+score over
    the particle axis and inserts ICI collectives for the weight/ESS
    reductions and the resampling gather.
    """
    from ..samplers.chain import collect_variables
    from ..samplers.smc import SmcState

    k_init, k_scan = jax.random.split(key)

    # computation follows data: sharded inputs are enough for GSPMD to
    # partition the whole scanned program — no mesh context needed
    _, state0 = jax.jit(lambda k: sampler.init(k, model, n_particles))(k_init)
    state0 = shard_state(state0, mesh)

    def body(state, k):
        sample, new_state = sampler.step(k, model, state)
        out = collect_variables(
            new_state if isinstance(new_state, SmcState) else sample, collect_vars
        )
        return new_state, out

    @jax.jit
    def run(state0, keys):
        return jax.lax.scan(body, state0, keys)

    keys = jax.random.split(k_scan, n_steps - 1)
    final_state, outs = run(state0, keys)
    return outs, final_state
