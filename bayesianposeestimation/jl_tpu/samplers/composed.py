"""ComposedSampler & CoordinateSampler: mixing move kinds.

Parity targets: /root/reference/src/ComposedSampler.jl (weighted random
sub-sampler per step, :12-28,54-58) and /root/reference/src/CoordinateSampler.jl
(all sub-samplers sequentially each step, :12-15,41-45).

TPU-native: the reference picks the sub-sampler with a host-side RNG; here the
pick is a device-side categorical feeding ``lax.switch`` — all branches are
compiled once, the trace stays static, and the whole composed step lives in
the same XLA program as everything else. All sub-samplers must share one
state structure (they do: MCMCState for MH/MTM, SmcState for SMC — same
variables, since μ/o are recomputed rather than stored).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["ComposedSampler", "CoordinateSampler"]


@dataclass(frozen=True, eq=False)
class ComposedSampler:
    samplers: tuple
    weights: Any = None  # logits-free probability weights; uniform if None

    def _probs(self):
        if self.weights is None:
            return jnp.full((len(self.samplers),), 1.0 / len(self.samplers))
        w = jnp.asarray(self.weights, jnp.float32)
        return w / jnp.sum(w)

    def init(self, key, model, n_particles=None):
        """First sampler initializes (parity: ComposedSampler.jl:44-50)."""
        return self.samplers[0].init(key, model, n_particles)

    def step(self, key, model, state):
        """(parity: ComposedSampler.jl:54-58, host rand -> device categorical)"""
        k_pick, k_step = jax.random.split(key)
        idx = jax.random.categorical(k_pick, jnp.log(self._probs()))
        branches = [
            (lambda s: (lambda kk, st: s.step(kk, model, st)))(s) for s in self.samplers
        ]
        return jax.lax.switch(idx, branches, k_step, state)


@dataclass(frozen=True, eq=False)
class CoordinateSampler:
    """Runs all sub-samplers sequentially in one step (block/coordinate-wise;
    used by the particle filter — parity: CoordinateSampler.jl:12-15,41-45)."""

    samplers: tuple

    def init(self, key, model, n_particles=None):
        return self.samplers[0].init(key, model, n_particles)

    def step(self, key, model, state):
        keys = jax.random.split(key, len(self.samplers))
        sample = None
        for k, s in zip(keys, self.samplers):
            sample, state = s.step(k, model, state)
        return sample, state
