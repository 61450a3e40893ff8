"""Likelihood-tempering schedules ϕ: 0 -> 1.

Parity: /root/reference/src/Tempering.jl (Constant :14-16, Linear :22-26,
Exponential :32-42). Pure functions of the current temperature so they work
inside lax.scan carries.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

__all__ = ["ConstantSchedule", "LinearSchedule", "ExponentialSchedule"]


@dataclass(frozen=True)
class ConstantSchedule:
    """Sample from the untempered posterior (ϕ ≡ 1)."""

    def increment(self, temperature):
        return jnp.ones_like(jnp.asarray(temperature, jnp.float32))


@dataclass(frozen=True)
class LinearSchedule:
    """ϕ += 1/n_steps, capped at 1."""

    n_steps: int

    def increment(self, temperature):
        t = jnp.asarray(temperature, jnp.float32)
        return jnp.minimum(1.0, t + 1.0 / self.n_steps)


@dataclass(frozen=True)
class ExponentialSchedule:
    """Exponential saturation towards 1, reaching ``goal_temp`` after n_steps."""

    n_steps: int
    goal_temp: float = 0.99

    @property
    def lam(self):
        import math

        return -math.log(1.0 - self.goal_temp) / self.n_steps

    def increment(self, temperature):
        t = jnp.asarray(temperature, jnp.float32)
        decay = jnp.exp(-self.lam)
        return t * decay + (1.0 - decay)
