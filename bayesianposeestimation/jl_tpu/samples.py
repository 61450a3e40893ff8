"""Sample: the immutable state container flowing through all samplers.

Parity target: /root/reference/src/Samples.jl — ``Sample{variables, log_prob,
log_like}`` (:11-15), domain transforms with logjac (:66-81), merge semantics
(:107-123) and tangent-space arithmetic ⊕/⊖ (:131-141).

TPU-native design: a registered pytree dataclass whose ``variables`` is a
plain dict of arrays with *leading* particle batch dims (the reference uses
trailing dims, Julia being column-major). All operations are pure and
jit/vmap/scan-safe. Quaternion-valued variables use tangent-space ⊕/⊖
(rotation vectors in R^3) — which variables are quaternions is static
metadata supplied by the model (``quaternion_names``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any

import jax
import jax.numpy as jnp

from . import quaternions as quat

__all__ = ["Sample", "sample_plus", "sample_minus", "to_model_domain", "to_unconstrained_domain"]


@dataclass(frozen=True)
class Sample:
    """variables: dict name -> array; log_prob / log_like: [...] batched."""

    variables: dict
    log_prob: Any = -jnp.inf
    log_like: Any = -jnp.inf

    # -- accessors mirroring the reference API ------------------------------
    @property
    def names(self):
        return tuple(self.variables.keys())

    def __getitem__(self, names):
        if isinstance(names, str):
            names = (names,)
        return Sample({k: self.variables[k] for k in names})

    def merge(self, other) -> "Sample":
        """Right-biased merge of variables; log densities reset to -inf
        (parity: /root/reference/src/Samples.jl:107-123)."""
        other_vars = other.variables if isinstance(other, Sample) else other
        return Sample({**self.variables, **other_vars})

    def set_logdensities(self, log_prob, log_like) -> "Sample":
        return replace(self, log_prob=log_prob, log_like=log_like)


jax.tree_util.register_pytree_node(
    Sample,
    lambda s: ((s.variables, s.log_prob, s.log_like), None),
    lambda _, c: Sample(*c),
)


def _tangent_add(name, value, delta, quaternion_names):
    if name in quaternion_names:
        return quat.qplus(value, delta)
    return value + delta


def _tangent_sub(name, a, b, quaternion_names):
    if name in quaternion_names:
        return quat.qminus(a, b)
    return a - b


def sample_plus(s: Sample, deltas: dict, quaternion_names=()) -> Sample:
    """s ⊕ deltas in the unconstrained domain; quaternion variables get the
    tangent-space update q * exp(v) (parity: /root/reference/src/Samples.jl:131-135)."""
    new_vars = {
        k: (_tangent_add(k, v, deltas[k], quaternion_names) if k in deltas else v)
        for k, v in s.variables.items()
    }
    return Sample(new_vars)


def sample_minus(a: Sample, b: Sample, names=None, quaternion_names=()) -> dict:
    """a ⊖ b: per-variable tangent differences (parity: Samples.jl:137-141).
    Returns a dict of deltas for ``names`` (default: intersection)."""
    if names is None:
        names = tuple(k for k in a.variables if k in b.variables)
    return {
        k: _tangent_sub(k, a.variables[k], b.variables[k], quaternion_names) for k in names
    }


def to_model_domain(s: Sample, bijectors: dict, batch_ndim: int = 1):
    """Unconstrained -> model domain via inverse bijectors; returns
    (model_sample, summed logjac) (parity: Samples.jl:66-72).

    ``batch_ndim``: number of LEADING batch axes to keep in the logjac —
    event dims beyond them are summed. MTM evaluates [n_tries, n_chains]
    batches (batch_ndim=2); summing axis 1 there would collapse the chain
    axis and mis-broadcast against [T, N] densities."""
    logjac = jnp.zeros(())
    new_vars = dict(s.variables)
    for name, b in bijectors.items():
        if name in new_vars:
            x, lj = b.inverse_with_logjac(new_vars[name])
            new_vars[name] = x
            lj_arr = jnp.asarray(lj)
            if lj_arr.ndim > batch_ndim:
                lj_arr = jnp.sum(lj_arr, axis=tuple(range(batch_ndim, lj_arr.ndim)))
            logjac = logjac + lj_arr
    return replace(s, variables=new_vars), logjac


def to_unconstrained_domain(s: Sample, bijectors: dict) -> Sample:
    """Model -> unconstrained domain (parity: Samples.jl:78-81)."""
    new_vars = {
        k: (bijectors[k].forward(v) if k in bijectors else v) for k, v in s.variables.items()
    }
    return Sample(new_vars, s.log_prob, s.log_like)
