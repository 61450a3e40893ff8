"""Sequential Monte Carlo with likelihood tempering and parallel systematic
resampling.

Parity target: /root/reference/src/SequentialMonteCarlo.jl — sampler/state
(:9-26), importance-sampling init (:30-43), the Del Moral 2006 step
(:49-68), kernels ``ForwardProposalKernel`` (:81-99, Green 2022),
``MhKernel`` (:101-116, weight increment (ϕ₂-ϕ₁)·ℓ_like per Nguyen 2016),
``BootstrapKernel`` (:124-137), ``AdaptiveKernel`` (:143-202), systematic
resampling (:221-265), ``log_relative_ess`` (:240), weight normalization
(:273-277).

TPU-native redesign
-------------------
* Systematic resampling is a *parallel* op: normalized-weight cumsum +
  ``searchsorted`` against stratified uniforms — replaces the reference's
  sequential O(N) CPU loop (:246-265).
* ESS-conditional resampling is branch-free: indices are always computed and
  selected with ``jnp.where`` (tiny gather of t/r only — μ/o are recomputed,
  which the reference calls out as the expensive part of resampling, :253).
* The adaptive covariance (weighted particle covariance + Cholesky with a
  positive-definiteness fallback, :168-202) runs entirely on device.
* Everything is one traced step function; the chain driver scans it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ..proposals import propose, transition_probability
from ..samples import Sample
from .mh import mh_kernel

__all__ = [
    "SequentialMonteCarlo",
    "SmcState",
    "ForwardProposalKernel",
    "MhKernel",
    "BootstrapKernel",
    "AdaptiveKernel",
    "systematic_resampling_indices",
    "resample_systematic",
    "log_relative_ess",
    "normalize_log_weights",
    "logevidence",
]


@dataclass(frozen=True)
class SmcState:
    sample: Sample
    log_weights: Any  # [N] normalized
    log_evidence: Any  # scalar
    temperature: Any  # scalar
    log_relative_ess: Any  # scalar, log(ESS / N)


jax.tree_util.register_pytree_node(
    SmcState,
    lambda s: ((s.sample, s.log_weights, s.log_evidence, s.temperature, s.log_relative_ess), None),
    lambda _, c: SmcState(*c),
)


def logevidence(state: SmcState):
    """(parity: SequentialMonteCarlo.jl:28)"""
    return state.log_evidence


def normalize_log_weights(log_weights):
    """Log-domain weight normalization, guarding the all--inf case
    (parity: SequentialMonteCarlo.jl:273-277)."""
    denom = logsumexp(log_weights)
    return jnp.where(jnp.isfinite(denom), log_weights - denom, log_weights)


def log_relative_ess(log_weights):
    """log(ESS/N) = -logsumexp(2w) - log N for normalized weights
    (parity: SequentialMonteCarlo.jl:236-240)."""
    n = log_weights.shape[-1]
    return -logsumexp(2.0 * log_weights, axis=-1) - jnp.log(jnp.asarray(n, log_weights.dtype))


def systematic_resampling_indices(key, log_weights):
    """Systematic (stratified, single-uniform) resampling as a parallel op.

    Replaces the sequential log-domain loop of
    /root/reference/src/SequentialMonteCarlo.jl:246-265 with cumsum +
    searchsorted: positions u/N + i/N against the normalized-weight CDF.
    """
    n = log_weights.shape[-1]
    w = jnp.exp(normalize_log_weights(log_weights))
    # guard: all weights -inf (degenerate) -> uniform
    w = jnp.where(jnp.all(w == 0), jnp.full_like(w, 1.0 / n), w)
    cdf = jnp.cumsum(w)
    cdf = cdf / cdf[-1]  # exact 1 at the end despite fp error
    u = jax.random.uniform(key, ())
    positions = (u + jnp.arange(n, dtype=w.dtype)) / n
    idx = jnp.searchsorted(cdf, positions, side="left")
    return jnp.clip(idx, 0, n - 1).astype(jnp.int32)


def _gather_sample(sample: Sample, idx) -> Sample:
    vars_ = {k: v[idx] for k, v in sample.variables.items()}
    return Sample(vars_, sample.log_prob[idx], sample.log_like[idx])


def resample_systematic(key, state: SmcState) -> SmcState:
    """Resample particles; weights reset to uniform
    (parity: SequentialMonteCarlo.jl:214-234)."""
    idx = systematic_resampling_indices(key, state.log_weights)
    n = state.log_weights.shape[-1]
    uniform = jnp.full((n,), -jnp.log(jnp.asarray(n, jnp.float32)))
    return SmcState(
        _gather_sample(state.sample, idx),
        uniform,
        state.log_evidence,
        state.temperature,
        state.log_relative_ess,
    )


def maybe_resample(key, state: SmcState, log_relative_ess_threshold) -> SmcState:
    """Branch-free ESS-triggered resampling (parity: :207-212): both paths are
    computed; a where-select keeps the XLA program static."""
    resampled = resample_systematic(key, state)
    do = state.log_relative_ess < log_relative_ess_threshold
    return jax.tree.map(lambda a, b: jnp.where(do, a, b), resampled, state)


# --------------------------------------------------------------------------- #
# SMC forward kernels
# --------------------------------------------------------------------------- #


@dataclass(frozen=True, eq=False)
class ForwardProposalKernel:
    """Forward-proposal L-kernel (Green 2022): MH-ratio-like weight increment
    (parity: SequentialMonteCarlo.jl:81-99)."""

    proposal: Any

    def propose(self, key, state: SmcState):
        return propose(key, self.proposal, state.sample)

    def forward(self, key, new_sample, old_sample):
        return new_sample

    def incremental_weights(self, new_sample: Sample, new_temp, old_state: SmcState):
        fwd = transition_probability(self.proposal, new_sample, old_state.sample)
        bwd = transition_probability(self.proposal, old_state.sample, new_sample)
        return new_sample.log_prob + bwd - old_state.sample.log_prob - fwd


@dataclass(frozen=True, eq=False)
class MhKernel:
    """MCMC forward kernel (Del Moral 2006 §3.1.1); tempered-target increment
    (ϕ₂-ϕ₁)·ℓ_like(old) per Nguyen 2016
    (parity: SequentialMonteCarlo.jl:101-116)."""

    proposal: Any

    def propose(self, key, state: SmcState):
        return propose(key, self.proposal, state.sample)

    def forward(self, key, new_sample, old_sample):
        return mh_kernel(key, self.proposal, new_sample, old_sample)

    def incremental_weights(self, new_sample: Sample, new_temp, old_state: SmcState):
        return (new_temp - old_state.temperature) * old_state.sample.log_like


@dataclass(frozen=True, eq=False)
class BootstrapKernel:
    """SIR bootstrap filter kernel: prior-transition proposal, likelihood
    weight increment (Dai 2022) (parity: SequentialMonteCarlo.jl:124-137)."""

    proposal: Any

    def propose(self, key, state: SmcState):
        return propose(key, self.proposal, state.sample)

    def forward(self, key, new_sample, old_sample):
        return new_sample

    def incremental_weights(self, new_sample: Sample, new_temp, old_state: SmcState):
        return new_sample.log_like


def adaptive_deltas(key, state: SmcState, names, sigmas, quaternion_names, corrected=True):
    """Draw zero-centered perturbations whose covariance is the weighted
    particle covariance; falls back to the configured σ when the covariance
    is not positive definite (parity: adaptive_mvnormal at
    SequentialMonteCarlo.jl:168-202, incl. the Cholesky guard).

    Runs fully on device — the reference pulls particles to the host for
    StatsBase.cov. Quaternion variables keep the isotropic fallback (the
    reference notes adaptive rotation proposals do not work well,
    ExperimentSamplers.jl:168)."""
    out = {}
    keys = jax.random.split(key, max(len(names), 1))
    w = jnp.exp(normalize_log_weights(state.log_weights))
    for k, name in zip(keys, names):
        x = state.sample.variables[name]
        n = x.shape[0]
        sigma = jnp.asarray(sigmas[name])
        if name in quaternion_names:
            # tangent-space 3-vector perturbation, isotropic
            out[name] = sigma * jax.random.normal(k, (n, 3), x.dtype)
            continue
        if x.ndim == 1:
            # scalar variable: weighted variance (reference: vector -> var,
            # SequentialMonteCarlo.jl:178)
            mean = jnp.sum(w * x)
            var = jnp.sum(w * (x - mean) ** 2)
            if corrected:
                var = var / jnp.maximum(1.0 - jnp.sum(w * w), 1e-6)
            std = jnp.sqrt(var)
            std = jnp.where((std > 0) & jnp.isfinite(std), std, jnp.ravel(sigma)[0])
            out[name] = std * jax.random.normal(k, (n,), x.dtype)
            continue
        d = x.shape[-1]
        mean = jnp.einsum("n,nd->d", w, x)
        xc = x - mean
        cov = jnp.einsum("n,nd,ne->de", w, xc, xc)
        if corrected:
            # AnalyticWeights correction: 1 / (1 - sum w^2)
            cov = cov / jnp.maximum(1.0 - jnp.sum(w * w), 1e-6)
        chol = jnp.linalg.cholesky(cov)
        ok = jnp.all(jnp.isfinite(chol))
        chol_fb = jnp.broadcast_to(jnp.eye(d, dtype=x.dtype) * sigma, (d, d))
        chol = jnp.where(ok, chol, chol_fb)
        eps = jax.random.normal(k, (n, d), x.dtype)
        out[name] = eps @ chol.T
    return out


@dataclass(frozen=True, eq=False)
class AdaptiveKernel:
    """Wraps a kernel whose (symmetric) proposal's step size is replaced by
    the weighted particle covariance (parity: SequentialMonteCarlo.jl:143-165)."""

    kernel: Any
    sigmas: Any = None  # dict name -> fallback sigma; derived from proposal if None

    def _fallback_sigmas(self, proposal):
        if self.sigmas is not None:
            return self.sigmas
        return {name: 1e-2 for name in proposal.names}

    def propose(self, key, state: SmcState):
        proposal = self.kernel.proposal
        k_delta, _ = jax.random.split(key)
        deltas = adaptive_deltas(
            k_delta, state, proposal.names, self._fallback_sigmas(proposal),
            proposal.quaternion_names,
        )
        from ..samples import sample_plus

        return sample_plus(state.sample, deltas, proposal.quaternion_names)

    def forward(self, key, new_sample, old_sample):
        return self.kernel.forward(key, new_sample, old_sample)

    def incremental_weights(self, new_sample, new_temp, old_state):
        return self.kernel.incremental_weights(new_sample, new_temp, old_state)


# --------------------------------------------------------------------------- #
# The sampler
# --------------------------------------------------------------------------- #


@dataclass(frozen=True, eq=False)
class SequentialMonteCarlo:
    """(parity: SequentialMonteCarlo.jl:9-14)"""

    kernel: Any
    temp_schedule: Any
    n_particles: int
    log_relative_ess_threshold: float

    def init(self, key, model, n_particles=None):
        """Importance-sampling init at ϕ₀=0: prior = target → uniform weights,
        evidence 1 (parity: SequentialMonteCarlo.jl:30-43)."""
        n = self.n_particles if n_particles is None else n_particles
        sample = model.sample_prior(key, n)
        sample = model.tempered_logdensity_sample(sample, 0.0)
        log_weights = jnp.full((n,), -jnp.log(jnp.asarray(n, jnp.float32)))
        state = SmcState(sample, log_weights, jnp.zeros(()), jnp.zeros(()),
                         log_relative_ess(log_weights))
        return state.sample, state

    def step(self, key, model, old_state: SmcState):
        """(parity: SequentialMonteCarlo.jl:49-68)"""
        from ..posterior import retemper

        k_prop, k_fwd, k_res = jax.random.split(key, 3)
        new_temp = self.temp_schedule.increment(old_state.temperature)

        proposed = self.kernel.propose(k_prop, old_state)
        proposed = model.tempered_logdensity_sample(proposed, new_temp)
        # the MCMC forward kernel targets π_ϕnew: re-temper the old sample's
        # carried density (no re-render; see posterior.retemper)
        old_retempered = retemper(old_state.sample, old_state.temperature, new_temp)
        new_sample = self.kernel.forward(k_fwd, proposed, old_retempered)

        incr = self.kernel.incremental_weights(new_sample, new_temp, old_state)
        new_weights = old_state.log_weights + incr
        new_evidence = old_state.log_evidence + logsumexp(new_weights)
        normalized = normalize_log_weights(new_weights)
        new_state = SmcState(new_sample, normalized, new_evidence, new_temp,
                             log_relative_ess(normalized))

        resampled = maybe_resample(k_res, new_state, self.log_relative_ess_threshold)
        return resampled.sample, resampled
