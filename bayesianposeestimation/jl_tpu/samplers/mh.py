"""Metropolis-Hastings: vectorized accept/reject over the particle batch.

Parity target: /root/reference/src/MetropolisHastings.jl — sampler+state
(:10-20), init from the prior at ϕ=0 (:27-34), step = propose → tempered
logdensity → mh_kernel (:40-49), vectorized ``acceptance_ratio`` (:68-73),
``should_reject`` via log-uniform (:81-83), masked writeback (:89-125).

TPU-native: the rejection writeback is a branch-free ``jnp.where`` select per
variable — no masked scatter, no host sync; the whole step is one traced
function, scanned on device by the chain driver.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..proposals import propose, transition_probability
from ..samples import Sample

__all__ = ["MetropolisHastings", "MCMCState", "mh_kernel", "acceptance_ratio", "select_sample"]


@dataclass(frozen=True)
class MCMCState:
    sample: Sample
    temperature: Any


jax.tree_util.register_pytree_node(
    MCMCState,
    lambda s: ((s.sample, s.temperature), None),
    lambda _, c: MCMCState(*c),
)


def acceptance_ratio(proposal, proposed: Sample, previous: Sample):
    """log α = ℓ(prop) - ℓ(prev) + q(prev|prop) - q(prop|prev)
    (parity: MetropolisHastings.jl:68-73), vectorized over particles."""
    return (
        proposed.log_prob
        - previous.log_prob
        + transition_probability(proposal, previous, proposed)
        - transition_probability(proposal, proposed, previous)
    )


def select_sample(accept_mask, proposed: Sample, previous: Sample) -> Sample:
    """Branch-free per-particle select (replaces reject_vectorized! at
    MetropolisHastings.jl:89-125). accept_mask: [N] bool."""

    def sel(prop, prev):
        mask = accept_mask.reshape(accept_mask.shape + (1,) * (prop.ndim - accept_mask.ndim))
        return jnp.where(mask, prop, prev)

    variables = {
        k: (sel(v, previous.variables[k]) if k in previous.variables else v)
        for k, v in proposed.variables.items()
    }
    return Sample(
        variables,
        jnp.where(accept_mask, proposed.log_prob, previous.log_prob),
        jnp.where(accept_mask, proposed.log_like, previous.log_like),
    )


def mh_kernel(key, proposal, proposed: Sample, previous: Sample) -> Sample:
    """Vectorized MH transition (parity: mh_kernel at MetropolisHastings.jl:57-62)."""
    log_alpha = acceptance_ratio(proposal, proposed, previous)
    log_u = jnp.log(jax.random.uniform(key, jnp.shape(log_alpha)))
    accept = log_u <= log_alpha
    return select_sample(accept, proposed, previous)


@dataclass(frozen=True, eq=False)
class MetropolisHastings:
    """Sampler differing only by its proposal (MetropolisHastings.jl:6-13)."""

    proposal: Any
    temp_schedule: Any

    def init(self, key, model, n_particles: int):
        """Initial step: prior sample evaluated at ϕ=0
        (parity: MetropolisHastings.jl:27-34)."""
        sample = model.sample_prior(key, n_particles)
        sample = model.tempered_logdensity_sample(sample, 0.0)
        return sample, MCMCState(sample, jnp.zeros(()))

    def step(self, key, model, state: MCMCState):
        """(parity: MetropolisHastings.jl:40-49; the previous sample's density
        is re-tempered to ϕ_new so both sides of the ratio target the same
        tempered posterior — see posterior.retemper)"""
        from ..posterior import retemper

        k_prop, k_accept = jax.random.split(key)
        new_temp = self.temp_schedule.increment(state.temperature)
        previous = retemper(state.sample, state.temperature, new_temp)
        proposed = propose(k_prop, self.proposal, previous)
        proposed = model.tempered_logdensity_sample(proposed, new_temp)
        result = mh_kernel(k_accept, self.proposal, proposed, previous)
        return result, MCMCState(result, new_temp)
