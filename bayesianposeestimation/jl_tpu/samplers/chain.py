"""Chain drivers: the AbstractMCMC ``sample`` equivalent as one lax.scan.

Parity targets: AbstractMCMC.sample (chain driver used at
/root/reference/scripts/demo_inference.jl:154) and ``smc_inference``
(/root/reference/src/ExperimentSamplers.jl:186-195) including the
``collect_vars`` memory thinning of /root/reference/src/ExperimentUtils.jl:38-40.

TPU-native: the reference steps the sampler from Julia with a GPU→CPU sync
per step (SURVEY.md §3.1); here the *entire chain* is one compiled device
program — host contact only at the end.
"""

from __future__ import annotations

from functools import partial

import jax

from .smc import SmcState

__all__ = ["sample_chain", "smc_inference", "collect_variables"]


def collect_variables(sample_or_state, var_names=("t", "r")):
    """Thin a sample/state to selected variables + densities
    (parity: ExperimentUtils.jl:38-40)."""
    if isinstance(sample_or_state, SmcState):
        s = sample_or_state.sample
        return {
            **{k: s.variables[k] for k in var_names if k in s.variables},
            "log_prob": s.log_prob,
            "log_like": s.log_like,
            "log_weights": sample_or_state.log_weights,
            "log_evidence": sample_or_state.log_evidence,
            "log_relative_ess": sample_or_state.log_relative_ess,
            "temperature": sample_or_state.temperature,
        }
    s = sample_or_state
    return {
        **{k: s.variables[k] for k in var_names if k in s.variables},
        "log_prob": s.log_prob,
        "log_like": s.log_like,
    }


@partial(jax.jit, static_argnames=("model", "sampler", "n_steps", "n_particles",
                                   "collect_vars", "collect_every", "n_burn_in"))
def sample_chain(key, model, sampler, n_steps, n_particles=None,
                 collect_vars=("t", "r"), collect_every=1, n_burn_in=0):
    """Run init + (n_steps-1) scanned steps; returns (collected, final_state).

    ``collected`` stacks ``collect_variables`` outputs along a leading step
    axis. ``n_burn_in`` / ``collect_every`` mirror AbstractMCMC's
    discard_initial / thinning (reference Parameters n_burn_in/n_thinning,
    used at scripts/demo_inference.jl:154) — applied after the scan, so the
    device program stays a single static scan.
    """
    k_init, k_scan = jax.random.split(key)
    _, state0 = sampler.init(k_init, model, n_particles)

    def body(state, k):
        sample, new_state = sampler.step(k, model, state)
        out = collect_variables(
            new_state if isinstance(new_state, SmcState) else sample, collect_vars
        )
        return new_state, out

    keys = jax.random.split(k_scan, n_steps - 1)
    final_state, outs = jax.lax.scan(body, state0, keys)
    if n_burn_in > 0 or collect_every > 1:
        outs = jax.tree.map(lambda x: x[n_burn_in::collect_every], outs)
    return outs, final_state


def smc_inference(key, posterior, sampler, params, collect_vars=("t", "r")):
    """(parity: smc_inference at ExperimentSamplers.jl:186-195)

    Returns (collected_states, final_state); collected arrays have leading
    dim n_steps-1 (the reference collects all n_steps incl. init)."""
    return sample_chain(key, posterior, sampler, params.n_steps,
                        params.n_particles, collect_vars)
