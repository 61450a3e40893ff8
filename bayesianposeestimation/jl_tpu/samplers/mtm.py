"""Multiple-Try Metropolis: importance-weighted selection among n_tries.

Parity target: /root/reference/src/MultipleTry.jl — general MTM with auxiliary
weights (:37-73), Gumbel-max categorical selection in log domain (:119),
per-variable selection along the try axis (:122-135), and the Martino 2016
random-try-count mixing fix (:42).

TPU-native redesign: the reference runs a scalar chain with the try axis as
its vectorization dim; here the chain is batched over ``n_chains`` AND tries —
arrays are [n_tries, n_chains, ...], flattened through the renderer, so one
MTM step renders n_tries * n_chains hypotheses in one program. The random
try count (host ``rand(2:n_tries)`` in the reference) becomes a static-shape
mask: all n_tries are computed, tries >= m get weight -inf.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ..proposals import propose, transition_probability
from ..samples import Sample
from .mh import MCMCState

__all__ = ["MultipleTry", "gumbel_index"]


def gumbel_index(key, log_weights, axis=0):
    """Gumbel-max categorical sampling in the log domain
    (parity: MultipleTry.jl:114-119)."""
    g = jax.random.gumbel(key, jnp.shape(log_weights))
    return jnp.argmax(log_weights + g, axis=axis)


def _select_try(variables: dict, names, idx, n_chains):
    """Gather try ``idx[c]`` for each chain c along axis 0 for the proposed
    ``names`` (parity: select_variables_dim at MultipleTry.jl:122-135)."""
    chain = jnp.arange(n_chains)
    return {
        k: (v[idx, chain] if k in names else v) for k, v in variables.items()
    }


@dataclass(frozen=True, eq=False)
class MultipleTry:
    """(parity: MultipleTry.jl:11-15)"""

    proposal: Any
    n_tries: int
    temp_schedule: Any

    def init(self, key, model, n_particles: int):
        sample = model.sample_prior(key, n_particles)
        sample = model.tempered_logdensity_sample(sample, 0.0)
        return sample, MCMCState(sample, jnp.zeros(()))

    def _broadcast_untouched(self, s: Sample, t: int) -> Sample:
        """Proposed names already carry the try axis [T, N, ...]; broadcast the
        untouched variables to match."""
        names = self.proposal.names
        vars_ = {
            k: (v if k in names else jnp.broadcast_to(v, (t, *v.shape)))
            for k, v in s.variables.items()
        }
        return Sample(vars_)

    def step(self, key, model, old_state: MCMCState):
        """General MTM step (parity: MultipleTry.jl:37-73)."""
        from ..posterior import retemper

        k_m, k_prop, k_sel, k_aux, k_acc = jax.random.split(key, 5)
        t = self.n_tries
        proposal = self.proposal
        names = proposal.names
        new_temp = self.temp_schedule.increment(old_state.temperature)
        # previous sample's density at the current target temperature
        prev = retemper(old_state.sample, old_state.temperature, new_temp)
        n_chains = prev.variables[names[0]].shape[0]

        # Martino 2016 mixing fix: random try count in [2, n_tries] as a mask
        m = jax.random.randint(k_m, (), 2, t + 1)
        try_mask = jnp.arange(t) < m  # [T]
        mask_neg = jnp.where(try_mask, 0.0, -jnp.inf)[:, None]  # [T,1]

        # propose T tries per chain and weight them
        pro = propose(k_prop, proposal, prev, (t,))
        pro = self._broadcast_untouched(pro, t)
        pro = model.tempered_logdensity_sample(pro, new_temp, batch_ndim=2)
        pro_transition = transition_probability(proposal, pro, prev, batch_ndim=2)
        pro_weights = pro.log_prob - pro_transition + mask_neg  # [T, N]

        # select one try per chain ∝ importance weight
        sel_idx = gumbel_index(k_sel, pro_weights, axis=0)  # [N]
        chain = jnp.arange(n_chains)
        sel_vars = _select_try(pro.variables, names, sel_idx, n_chains)
        # untouched variables keep their original (unbroadcast) values
        sel_vars = {k: (sel_vars[k] if k in names else prev.variables[k])
                    for k in prev.variables}
        selected = Sample(sel_vars, pro.log_prob[sel_idx, chain], pro.log_like[sel_idx, chain])

        # T-1 auxiliary tries from the selected sample (one slot reserved for
        # the previous sample, Martino's reference-set construction)
        aux = propose(k_aux, proposal, selected, (t - 1,))
        aux = self._broadcast_untouched(aux, t - 1)
        aux = model.tempered_logdensity_sample(aux, new_temp, batch_ndim=2)
        aux_transition = transition_probability(proposal, aux, selected, batch_ndim=2)
        aux_mask = jnp.where(jnp.arange(t - 1)[:, None] < (m - 1), 0.0, -jnp.inf)
        aux_weights = aux.log_prob - aux_transition + aux_mask  # [T-1, N]
        state_weight = prev.log_prob - transition_probability(proposal, prev, selected)
        aux_full = jnp.concatenate([aux_weights, state_weight[None, :]], axis=0)  # [T, N]

        # acceptance: logsumexp ratio of proposal vs auxiliary weights
        log_alpha = logsumexp(pro_weights, axis=0) - logsumexp(aux_full, axis=0)  # [N]
        accept = jnp.log(jax.random.uniform(k_acc, (n_chains,))) <= log_alpha

        def sel(a, b):
            mask = accept.reshape(accept.shape + (1,) * (a.ndim - 1))
            return jnp.where(mask, a, b)

        out_vars = {k: sel(selected.variables[k], prev.variables[k]) for k in prev.variables}
        result = Sample(
            out_vars,
            jnp.where(accept, selected.log_prob, prev.log_prob),
            jnp.where(accept, selected.log_like, prev.log_like),
        )
        return result, MCMCState(result, new_temp)
