"""Proposal models: additive, symmetric, independent — always in ℝⁿ.

Parity target: /root/reference/src/Proposals.jl — propose in the unconstrained
domain (:5-8), additive ⊕ random walk (:82-90), independent draws (:96-104),
transition probabilities (:112-129). Gibbs-style analytic proposals live in
``samplers/gibbs.py``.

TPU-native notes: proposals are static objects; ``propose`` and
``transition_probability`` trace to pure jnp code. Deterministic downstream
nodes (render μ) are *not* evaluated here — the posterior recomputes them
inside its density (see posterior.py docstring); ``evaluation_names`` is kept
for API parity and introspection.
"""

from __future__ import annotations

import jax.numpy as jnp

from .graph import downstream_deterministic, logdensityof_graph, sample_graph, sequentialize
from .samples import Sample, sample_minus, sample_plus, to_model_domain

__all__ = [
    "Proposal",
    "additive_proposal",
    "independent_proposal",
    "symmetric_proposal",
    "propose",
    "transition_probability",
]


class Proposal:
    """names: proposed variables; kind: 'additive' | 'symmetric' | 'independent'."""

    def __init__(self, proposal_graph: dict, posterior_model, kind: str):
        self.model = proposal_graph  # dict name -> node (sequentialized)
        self.kind = kind
        self.names = tuple(proposal_graph.keys())
        self.posterior_bijectors = posterior_model.bijectors
        self.quaternion_names = posterior_model.quaternion_names
        from .graph import bijectors_of

        self.proposal_bijectors = bijectors_of(proposal_graph)
        # parity: evaluation graph of deterministic nodes downstream of the
        # proposed variables (/root/reference/src/Proposals.jl:16-18)
        self.evaluation_names = downstream_deterministic(posterior_model.graph, self.names)

    def __repr__(self):
        return f"Proposal({self.kind}, names={self.names})"


def _as_graph(node_or_dict):
    if isinstance(node_or_dict, dict):
        return node_or_dict
    return sequentialize(node_or_dict)


def additive_proposal(proposal_model, posterior_model) -> Proposal:
    """x' = x ⊕ ε with asymmetric ε-distribution: forward/backward transition
    probabilities do not cancel (parity: Proposals.jl:46-50)."""
    return Proposal(_as_graph(proposal_model), posterior_model, "additive")


def symmetric_proposal(proposal_model, posterior_model) -> Proposal:
    """x' = x ⊕ ε, symmetric ε: transition probability ≡ 0 (Proposals.jl:57-62)."""
    return Proposal(_as_graph(proposal_model), posterior_model, "symmetric")


def independent_proposal(proposal_model, posterior_model) -> Proposal:
    """x' ~ q(x') independent of x (Proposals.jl:52-55)."""
    return Proposal(_as_graph(proposal_model), posterior_model, "independent")


def propose(key, proposal, previous: Sample, sample_shape=()) -> Sample:
    """Generate a proposal from the previous (unconstrained) sample.

    ``sample_shape``: extra leading dims (e.g. (n_tries,) for MTM); the
    per-particle batch dim is already part of the previous sample.
    Custom proposal objects (e.g. the particle filter's Dynamics) implement
    their own ``propose`` method and are dispatched to directly.
    """
    if not isinstance(proposal, Proposal):
        return proposal.propose(key, previous, sample_shape)
    if proposal.kind in ("additive", "symmetric"):
        batch = previous.variables[proposal.names[0]].shape[:1]
        deltas = sample_graph(proposal.model, key, (*sample_shape, *batch))
        return sample_plus(previous, deltas, proposal.quaternion_names)
    elif proposal.kind == "independent":
        batch = previous.variables[proposal.names[0]].shape[:1]
        # draw in the proposal's model domain
        draws = sample_graph(proposal.model, key, (*sample_shape, *batch))
        # unconstrained via the merged bijectors (proposal may differ from posterior)
        merged = {**proposal.posterior_bijectors, **proposal.proposal_bijectors}
        uncon = {k: merged[k].forward(v) if k in merged else v for k, v in draws.items()}
        # untouched variables keep their original shapes; callers that add a
        # try axis (MTM) broadcast them exactly once themselves
        out = dict(previous.variables)
        out.update(uncon)
        return Sample(out)
    raise ValueError(proposal.kind)


def transition_probability(proposal, new: Sample, prev: Sample, batch_ndim=1):
    """q(new | prev) in log space (parity: Proposals.jl:112-129).

    Symmetric proposals return 0 (cancels in the MH ratio)."""
    if not isinstance(proposal, Proposal):
        return proposal.transition_probability(new, prev, batch_ndim)
    if proposal.kind == "symmetric":
        return jnp.zeros(())
    if proposal.kind == "additive":
        deltas = sample_minus(new, prev, proposal.names, proposal.quaternion_names)
        return logdensityof_graph(proposal.model, deltas, batch_ndim)
    if proposal.kind == "independent":
        # transform only the proposed variables; logjac of the proposal bijectors
        sub = new[proposal.names]
        model_sub, logjac = to_model_domain(sub, proposal.proposal_bijectors,
                                            batch_ndim)
        return logdensityof_graph(proposal.model, model_sub.variables, batch_ndim) + logjac
    raise ValueError(proposal.kind)
