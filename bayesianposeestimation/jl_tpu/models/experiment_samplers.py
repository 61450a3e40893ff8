"""Sampler factories: the reference's named sampler configurations.

Parity target: /root/reference/src/ExperimentSamplers.jl — ``mh_sampler``
(:15-32), ``mh_local_sampler`` (:39-53), ``mtm_sampler`` (:60-77),
``mtm_local_sampler`` (:84-98), ``smc_forward`` (:105-120), ``smc_bootstrap``
(:128-143), ``smc_mh`` (:151-179) — each composes per-variable proposals
(t-symmetric random walk, r-symmetric tangent walk, r-independent
QuaternionUniform) through a ComposedSampler with the Parameters weights.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..distributions import Normal, QuaternionUniform
from ..graph import BroadcastedNode, sequentialize
from ..proposals import independent_proposal, symmetric_proposal
from ..samplers import (
    AdaptiveKernel,
    BootstrapKernel,
    ComposedSampler,
    ForwardProposalKernel,
    MetropolisHastings,
    MhKernel,
    MultipleTry,
    SequentialMonteCarlo,
)
from ..tempering import LinearSchedule

__all__ = [
    "mh_sampler",
    "mh_local_sampler",
    "mtm_sampler",
    "mtm_local_sampler",
    "smc_forward",
    "smc_bootstrap",
    "smc_mh",
]


def _sym_proposals(params, posterior):
    """t and r symmetric random-walk proposal graphs (tangent-space for r)."""
    t_sym = sequentialize(
        BroadcastedNode("t", Normal, 0.0, jnp.asarray(params.proposal_sigma_t))
    )
    r_sym = sequentialize(
        BroadcastedNode("r", Normal, 0.0, jnp.asarray(params.proposal_sigma_r))
    )
    return (
        symmetric_proposal(t_sym, posterior),
        symmetric_proposal(r_sym, posterior),
    )


def _r_independent(params, posterior):
    r_ind = sequentialize(BroadcastedNode("r", QuaternionUniform))
    return independent_proposal(r_ind, posterior)


def mh_sampler(params, posterior):
    """t-sym + r-sym + ~10% r-independent MH moves
    (parity: ExperimentSamplers.jl:15-32)."""
    schedule = LinearSchedule(params.n_steps)
    t_prop, r_prop = _sym_proposals(params, posterior)
    r_ind = _r_independent(params, posterior)
    samplers = tuple(
        MetropolisHastings(p, schedule) for p in (t_prop, r_prop, r_ind)
    )
    return ComposedSampler(samplers, (params.w_t_sym, params.w_r_sym, params.w_r_ind))


def mh_local_sampler(params, posterior):
    """Local moves only (parity: ExperimentSamplers.jl:39-53)."""
    schedule = LinearSchedule(params.n_steps)
    t_prop, r_prop = _sym_proposals(params, posterior)
    samplers = tuple(MetropolisHastings(p, schedule) for p in (t_prop, r_prop))
    return ComposedSampler(samplers, (params.w_t_sym, params.w_r_sym))


def mtm_sampler(params, posterior):
    """Multiple-try with independent exploration moves
    (parity: ExperimentSamplers.jl:60-77; n_tries = n_particles)."""
    schedule = LinearSchedule(params.n_steps)
    t_prop, r_prop = _sym_proposals(params, posterior)
    r_ind = _r_independent(params, posterior)
    samplers = tuple(
        MultipleTry(p, params.n_particles, schedule) for p in (t_prop, r_prop, r_ind)
    )
    return ComposedSampler(samplers, (params.w_t_sym, params.w_r_sym, params.w_r_ind))


def mtm_local_sampler(params, posterior):
    """(parity: ExperimentSamplers.jl:84-98)"""
    schedule = LinearSchedule(params.n_steps)
    t_prop, r_prop = _sym_proposals(params, posterior)
    samplers = tuple(MultipleTry(p, params.n_particles, schedule) for p in (t_prop, r_prop))
    return ComposedSampler(samplers, (params.w_t_sym, params.w_r_sym))


def _smc(params, kernel):
    return SequentialMonteCarlo(
        kernel, LinearSchedule(params.n_steps), params.n_particles,
        math.log(params.relative_ess),
    )


def _adaptive_sigmas(params, proposal):
    return {name: jnp.asarray(params.proposal_sigma_t) for name in proposal.names}


def smc_forward(params, posterior):
    """Forward-proposal kernels, adaptive t (parity: ExperimentSamplers.jl:105-120)."""
    t_prop, r_prop = _sym_proposals(params, posterior)
    t_kernel = AdaptiveKernel(ForwardProposalKernel(t_prop), _adaptive_sigmas(params, t_prop))
    r_kernel = ForwardProposalKernel(r_prop)
    samplers = tuple(_smc(params, k) for k in (t_kernel, r_kernel))
    return ComposedSampler(samplers, (params.w_t_sym, params.w_r_sym))


def smc_bootstrap(params, posterior):
    """Bootstrap kernels: loglikelihood as weight increment
    (parity: ExperimentSamplers.jl:128-143)."""
    t_prop, r_prop = _sym_proposals(params, posterior)
    samplers = tuple(
        _smc(params, BootstrapKernel(p)) for p in (t_prop, r_prop)
    )
    return ComposedSampler(samplers, (params.w_t_sym, params.w_r_sym))


def smc_mh(params, posterior):
    """THE headline sampler (BOP submission): MH kernels with tempered weight
    updates; adaptive t, symmetric r, independent r for exploration
    (parity: ExperimentSamplers.jl:151-179)."""
    t_prop, r_prop = _sym_proposals(params, posterior)
    r_ind = _r_independent(params, posterior)
    t_kernel = AdaptiveKernel(MhKernel(t_prop), _adaptive_sigmas(params, t_prop))
    r_kernel = MhKernel(r_prop)
    r_ind_kernel = MhKernel(r_ind)
    samplers = tuple(_smc(params, k) for k in (t_kernel, r_kernel, r_ind_kernel))
    return ComposedSampler(samplers, (params.w_t_sym, params.w_r_sym, params.w_r_ind))
