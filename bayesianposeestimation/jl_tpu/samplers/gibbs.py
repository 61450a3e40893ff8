"""Gibbs: analytic conditional proposals that are always accepted.

Parity target: /root/reference/src/Gibbs.jl — the proposal re-samples a node
conditioned on the remaining variables (:31-39), transition probability is
+inf i.e. always accepted (:45), and the sampler doubles as a proposal.
(The reference's shipped experiments use the *collapsed* analytic association
instead — a DeterministicNode — see ExperimentModels.jl:104; this sampler
exists for API parity and synthetic-model use.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..graph import BroadcastedNode, ModifierNode
from ..samples import Sample, to_model_domain, to_unconstrained_domain
from .mh import MCMCState

__all__ = ["Gibbs"]


@dataclass(frozen=True)
class Gibbs:
    """proposal_graph: dict name -> BroadcastedNode whose dist is the analytic
    conditional given its parent values."""

    proposal_graph: dict
    temp_schedule: Any
    bijectors: dict = None
    quaternion_names: tuple = ()

    def __hash__(self):
        return id(self)

    def _bijectors(self, model):
        return model.bijectors if self.bijectors is None else self.bijectors

    def init(self, key, model, n_particles: int):
        sample = model.sample_prior(key, n_particles)
        sample = model.logdensity_sample(sample)
        return sample, MCMCState(sample, jnp.zeros(()))

    def propose(self, key, model, sample: Sample) -> Sample:
        """Redraw the proposal variables from their conditionals given the
        current model-domain values (parity: Gibbs.jl:31-39)."""
        from ..distributions import broadcast_shape_of

        model_sample, _ = to_model_domain(sample, self._bijectors(model))
        values = dict(model_sample.variables)
        n = next(iter(sample.variables.values())).shape[0]
        keys = jax.random.split(key, max(len(self.proposal_graph), 1))
        for k, (name, node) in zip(keys, self.proposal_graph.items()):
            inner = node.wrapped if isinstance(node, ModifierNode) else node
            if isinstance(inner, BroadcastedNode):
                dist = inner.dist(values)
                b = broadcast_shape_of(dist)
                # conditionals with batched parents already carry the particle
                # dim; constant-parameter conditionals need it prepended
                values[name] = dist.sample(k) if b[:1] == (n,) else dist.sample(k, (n,))
        proposed = Sample({k: values[k] for k in sample.variables})
        return to_unconstrained_domain(proposed, self._bijectors(model))

    def step(self, key, model, old_state: MCMCState):
        """Always accepted (transition probability +inf, Gibbs.jl:45)."""
        new_temp = self.temp_schedule.increment(old_state.temperature)
        proposed = self.propose(key, model, old_state.sample)
        proposed = model.tempered_logdensity_sample(proposed, new_temp)
        return proposed, MCMCState(proposed, new_temp)
