"""Light directed-model-graph layer: named nodes compiled to pure functions.

Rebuilds the capability surface of BayesNet.jl that the reference builds its
posteriors from (SURVEY.md §2B; call sites at
/root/reference/src/ExperimentModels.jl:48-146, /root/reference/src/PosteriorModel.jl:19-27,
/root/reference/src/Proposals.jl:16-18):

* ``BroadcastedNode(name, dist_fn, *args)`` — stochastic node; args are
  parent nodes or constants, the distribution broadcasts over them.
* ``DeterministicNode(name, fn, *parents)`` — deterministic function node
  (e.g. the renderer μ(t, r) or the analytic association o(μ)).
* ``ModifierNode(node, modifier_fn)`` — wraps a node's logdensity
  (the image-likelihood regularizers, /root/reference/src/Models.jl:47-87).
* ``node | data`` — condition on an observation.

TPU-native design: the graph is *static Python structure*; ``sample`` /
``logdensityof`` / ``evaluate`` trace to pure jnp code under jit. There is no
runtime graph interpretation on device — sequentialization happens once at
trace time (mirroring BayesNet.jl's type-level ``sequentialize``). Batch dims
lead (reference uses trailing dims).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bijectors import IDENTITY
from .distributions import QuaternionNormal, QuaternionUniform

__all__ = [
    "BroadcastedNode",
    "DeterministicNode",
    "ModifierNode",
    "sequentialize",
    "sample_graph",
    "logdensityof_graph",
    "evaluate_deterministic",
    "bijectors_of",
    "quaternion_names_of",
]


class Node:
    """Base: named vertex with parent nodes."""

    def __init__(self, name: str):
        self.name = name
        self.observation = None  # conditioned data, set via __or__

    def __or__(self, data):
        """Condition the node on observed data (BayesNet's ``node | data``)."""
        import copy

        clone = copy.copy(self)
        clone.observation = data
        return clone

    @property
    def is_observed(self):
        return self.observation is not None

    def parent_nodes(self):
        raise NotImplementedError

    def __repr__(self):
        return f"{type(self).__name__}({self.name})"


class BroadcastedNode(Node):
    """Stochastic node: ``dist_fn(*args)`` builds the distribution, where node
    args are substituted with their sampled values.

    ``reduce_axes``: axes of the *event* to sum in logpdf (e.g. (-2, -1) for
    per-pixel image likelihoods — the BroadcastedDistribution pixel reduction
    of the reference). ``sample_ndim``: number of trailing event dims produced
    by one draw (e.g. 1 for a 3-vector, 0 for scalars).
    """

    def __init__(self, name, dist_fn, *args, reduce_axes=(), bijector=None):
        super().__init__(name)
        self.dist_fn = dist_fn
        self.args = args
        self.reduce_axes = reduce_axes
        self._bijector = bijector

    def parent_nodes(self):
        return tuple(a for a in self.args if isinstance(a, Node))

    def dist(self, values: dict):
        resolved = [values[a.name] if isinstance(a, Node) else a for a in self.args]
        return self.dist_fn(*resolved)

    def bijector(self):
        if self._bijector is not None:
            return self._bijector
        # instantiate with constant args only if possible, else identity
        try:
            resolved = [a for a in self.args if not isinstance(a, Node)]
            if len(resolved) == len(self.args):
                return self.dist_fn(*resolved).bijector
        except Exception:
            pass
        return IDENTITY


class DeterministicNode(Node):
    """Deterministic transform of parent values (renderer, association)."""

    def __init__(self, name, fn, *parents):
        super().__init__(name)
        self.fn = fn
        self.parents = parents

    def parent_nodes(self):
        return tuple(p for p in self.parents if isinstance(p, Node))

    def evaluate(self, values: dict):
        resolved = [values[p.name] if isinstance(p, Node) else p for p in self.parents]
        return self.fn(*resolved)


class ModifierNode(Node):
    """Wraps a node and transforms its logdensity: ``modifier_fn(ell, values)``
    (parity: BayesNet ModifierNode used for regularizers)."""

    def __init__(self, wrapped: Node, modifier_fn):
        super().__init__(wrapped.name)
        self.wrapped = wrapped
        self.modifier_fn = modifier_fn
        self.observation = wrapped.observation

    def __or__(self, data):
        import copy

        clone = copy.copy(self)
        clone.wrapped = self.wrapped | data
        clone.observation = data
        return clone

    def parent_nodes(self):
        return (self.wrapped,)


def sequentialize(root: Node) -> dict:
    """Topologically ordered dict name -> node (parents first).

    Mirrors BayesNet.jl's ``sequentialize``; runs once at build time.
    """
    order: dict = {}

    def visit(node: Node):
        for p in node.parent_nodes():
            visit(p)
        inner = node.wrapped if isinstance(node, ModifierNode) else node
        # ModifierNode replaces its wrapped node in the order
        order[inner.name] = node

    visit(root)
    return order


def _inner(node: Node) -> Node:
    return node.wrapped if isinstance(node, ModifierNode) else node


def sample_graph(graph: dict, key, sample_shape=()) -> dict:
    """Ancestral sampling in topological order. Observed nodes return their
    data. Returns dict name -> value with leading ``sample_shape`` batch dims."""
    values: dict = {}
    keys = jax.random.split(key, max(len(graph), 1))
    for k, (name, node) in zip(keys, graph.items()):
        inner = _inner(node)
        if node.observation is not None:
            values[name] = node.observation
        elif isinstance(inner, DeterministicNode):
            values[name] = inner.evaluate(values)
        elif isinstance(inner, BroadcastedNode):
            dist = inner.dist(values)
            # parents already carry the sample batch dims -> don't re-expand
            has_batched_parent = any(isinstance(a, Node) for a in inner.args)
            shape = () if has_batched_parent else sample_shape
            values[name] = dist.sample(k, shape)
        else:
            raise TypeError(f"cannot sample node {node}")
    return values


def logdensityof_graph(graph: dict, values: dict, batch_ndim=0):
    """Sum of node logdensities evaluated at ``values``.

    ``batch_ndim`` leading axes are treated as batch (particles); event dims
    beyond them are reduced per node (plus explicit ``reduce_axes``).
    Deterministic nodes contribute 0. Modifier nodes transform their wrapped
    node's contribution.
    """
    total = jnp.zeros(())
    for name, node in graph.items():
        inner = _inner(node)
        if not isinstance(inner, BroadcastedNode):
            continue
        x = values[name]
        ell = inner.dist(values).logpdf(x)
        # reduce event axes: everything beyond the batch dims
        if ell.ndim > batch_ndim:
            ell = jnp.sum(ell, axis=tuple(range(batch_ndim, ell.ndim)))
        if isinstance(node, ModifierNode):
            ell = node.modifier_fn(ell, values)
        total = total + ell
    return total


def evaluate_deterministic(graph: dict, values: dict, names=None) -> dict:
    """Re-evaluate deterministic nodes (downstream of changed variables).

    Parity: the proposal ``evaluation`` graphs of
    /root/reference/src/Proposals.jl:16-18 — after proposing t/r the render
    node μ must be recomputed.
    """
    out = dict(values)
    for name, node in graph.items():
        inner = _inner(node)
        if isinstance(inner, DeterministicNode) and (names is None or name in names):
            out[name] = inner.evaluate(out)
    return out


def downstream_deterministic(graph: dict, var_names) -> tuple:
    """Names of deterministic nodes reachable from ``var_names``."""
    dirty = set(var_names)
    result = []
    for name, node in graph.items():
        inner = _inner(node)
        if isinstance(inner, DeterministicNode):
            if any(p.name in dirty for p in inner.parent_nodes()):
                dirty.add(name)
                result.append(name)
    return tuple(result)


def bijectors_of(graph: dict) -> dict:
    """Eagerly materialized bijectors of the stochastic, unobserved nodes
    (parity: /root/reference/src/PosteriorModel.jl:19-27)."""
    out = {}
    for name, node in graph.items():
        inner = _inner(node)
        if isinstance(inner, BroadcastedNode) and not node.is_observed:
            out[name] = inner.bijector()
    return out


def quaternion_names_of(graph: dict) -> tuple:
    """Variables living on the quaternion manifold (S^3): their proposals use
    tangent-space ⊕/⊖ instead of Euclidean +/-."""
    names = []
    for name, node in graph.items():
        inner = _inner(node)
        if isinstance(inner, BroadcastedNode):
            try:
                resolved = [a for a in inner.args if not isinstance(a, Node)]
                if len(resolved) == len(inner.args):
                    d = inner.dist_fn(*resolved)
                    if isinstance(d, (QuaternionUniform, QuaternionNormal)):
                        names.append(name)
                    continue
            except Exception:
                pass
            if isinstance(inner.dist_fn, type) and issubclass(
                inner.dist_fn, (QuaternionUniform, QuaternionNormal)
            ):
                names.append(name)
    return tuple(names)
