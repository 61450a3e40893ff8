"""PosteriorModel: prior/observation split, unconstrained sampling, tempering.

Parity target: /root/reference/src/PosteriorModel.jl — construction splits the
sequentialized graph into prior vs observation nodes and eagerly materializes
the prior bijectors (:19-27); ``rand`` samples the prior in the unconstrained
domain (:40-44); ``logdensityof`` adds prior + logjac + likelihood (:52-66);
``tempered_logdensity`` is ℓ_prior + ϕ·ℓ_like (:74-88).

TPU-native difference: deterministic nodes (the renderer μ, the analytic
association o) are *recomputed* inside every density evaluation instead of
being stored and resampled with the particles — they are pure functions of
(t, r), so carrying them through resampling (which the reference notes is
expensive, /root/reference/src/SequentialMonteCarlo.jl:253) is pure overhead.
The whole evaluation fuses into one XLA program; nothing crosses to the host
(the reference syncs scalars to the CPU every step, PosteriorModel.jl:64-65).
"""

from __future__ import annotations

import jax.numpy as jnp

from .graph import (
    BroadcastedNode,
    ModifierNode,
    bijectors_of,
    evaluate_deterministic,
    logdensityof_graph,
    quaternion_names_of,
    sample_graph,
    sequentialize,
)
from .samples import Sample, to_model_domain, to_unconstrained_domain

__all__ = ["PosteriorModel", "tempered_logdensity", "retemper"]


def _is_stochastic(node):
    inner = node.wrapped if isinstance(node, ModifierNode) else node
    return isinstance(inner, BroadcastedNode)


class PosteriorModel:
    """Static model object (hashable by id; safe inside jit closures)."""

    def __init__(self, root_node):
        graph = sequentialize(root_node)
        self.graph = graph
        self.prior = {n: node for n, node in graph.items() if not node.is_observed}
        self.likelihood = {n: node for n, node in graph.items() if node.is_observed}
        # stochastic prior variables carried in Samples (deterministic nodes
        # are recomputed, not stored)
        self.prior_stochastic = {
            n: node for n, node in self.prior.items() if _is_stochastic(node)
        }
        self.bijectors = bijectors_of(self.prior)
        self.quaternion_names = quaternion_names_of(self.prior)

    # -- sampling -----------------------------------------------------------
    def sample_prior(self, key, n_particles: int) -> Sample:
        """Prior sample in the unconstrained domain, [n_particles, ...] leading
        batch (parity: rand at PosteriorModel.jl:40-44)."""
        values = sample_graph(self.prior_stochastic, key, (n_particles,))
        return to_unconstrained_domain(Sample(values), self.bijectors)

    # -- densities ----------------------------------------------------------
    def prior_and_likelihood(self, sample: Sample, batch_ndim: int = 1):
        """Returns (ℓ_prior + logjac, ℓ_likelihood), each [batch...]
        (parity: prior_and_likelihood at PosteriorModel.jl:52-66, minus the
        to-CPU sync)."""
        model_sample, logjac = to_model_domain(sample, self.bijectors, batch_ndim)
        values = evaluate_deterministic(self.graph, model_sample.variables)
        # attach observations for likelihood evaluation
        for name, node in self.likelihood.items():
            values.setdefault(name, node.observation)
        ell_prior = logdensityof_graph(self.prior, values, batch_ndim)
        ell_like = logdensityof_graph(self.likelihood, values, batch_ndim)
        return ell_prior + logjac, ell_like

    def logdensity_sample(self, sample: Sample, batch_ndim: int = 1) -> Sample:
        lp, ll = self.prior_and_likelihood(sample, batch_ndim)
        return sample.set_logdensities(lp + ll, ll)

    def tempered_logdensity_sample(self, sample: Sample, temp, batch_ndim: int = 1) -> Sample:
        """ℓ = ℓ_prior + ϕ·ℓ_like (parity: PosteriorModel.jl:74-88). ``temp``
        may be a traced scalar — no branching on its value."""
        lp, ll = self.prior_and_likelihood(sample, batch_ndim)
        return sample.set_logdensities(tempered_logdensity(lp, ll, temp), ll)


def retemper(sample, old_temp, new_temp):
    """Re-evaluate a sample's tempered log density at a new temperature using
    the stored ℓ_like — no model evaluation (render) needed:
    ℓ_ϕ' = ℓ_ϕ + (ϕ'-ϕ)·ℓ_like.

    Fixes a subtle bias of the reference: its MH acceptance compares the
    proposed sample at ϕ_new with the previous sample's density carried from
    ϕ_old (/root/reference/src/MetropolisHastings.jl:40-49) — negligible for
    its 3000-step schedules but catastrophic for temperature jumps (a chain
    initialized at ϕ=0 under a ConstantSchedule would never accept).
    """
    delta = jnp.asarray(new_temp) - jnp.asarray(old_temp)
    adj = jnp.where(delta != 0, delta * sample.log_like, 0.0)
    return sample.set_logdensities(sample.log_prob + adj, sample.log_like)


def tempered_logdensity(log_prior, log_likelihood, temp=1.0):
    """ℓ_prior + ϕ·ℓ_like with the ϕ=0 guard: a -inf likelihood must not
    poison the prior-only density (0 * -inf = nan)."""
    temp = jnp.asarray(temp, jnp.result_type(log_likelihood))
    scaled = jnp.where(temp > 0, temp * log_likelihood, 0.0)
    return log_prior + scaled
