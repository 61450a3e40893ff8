"""Model-graph + PosteriorModel tests on a synthetic model (no renderer).

Mirrors /root/reference/test/smc.jl's synthetic BayesNet (a, b -> c observed)
and /root/reference/test/samples.jl's domain-transform identities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianposeestimation.jl_tpu.distributions import Exponential, Normal
from bayesianposeestimation.jl_tpu.graph import (
    BroadcastedNode,
    DeterministicNode,
    ModifierNode,
    bijectors_of,
    sequentialize,
)
from bayesianposeestimation.jl_tpu.posterior import PosteriorModel, tempered_logdensity
from bayesianposeestimation.jl_tpu.proposals import (
    additive_proposal,
    independent_proposal,
    propose,
    symmetric_proposal,
    transition_probability,
)
from bayesianposeestimation.jl_tpu.samples import Sample, to_model_domain


def synthetic_posterior(obs):
    """a ~ Exp(1) (constrained!), b ~ Normal(0,1), c ~ Normal(a+b, 0.1) | obs."""
    a = BroadcastedNode("a", Exponential, 1.0)
    b = BroadcastedNode("b", Normal, 0.0, 1.0)
    mean = DeterministicNode("mean", lambda a, b: a + b, a, b)
    c = BroadcastedNode("c", Normal, mean, 0.1) | obs
    return PosteriorModel(c)


def test_prior_obs_split():
    model = synthetic_posterior(jnp.float32(1.0))
    assert set(model.prior_stochastic) == {"a", "b"}
    assert set(model.likelihood) == {"c"}
    # Exponential gets the log bijector
    from bayesianposeestimation.jl_tpu.bijectors import Log

    assert isinstance(model.bijectors["a"], Log)


def test_sample_prior_unconstrained(key):
    model = synthetic_posterior(jnp.float32(1.0))
    s = model.sample_prior(key, 100)
    # a is stored as log(a) in R — can be negative
    assert s.variables["a"].shape == (100,)
    assert bool(jnp.any(s.variables["a"] < 0))
    model_s, logjac = to_model_domain(s, model.bijectors)
    assert bool(jnp.all(model_s.variables["a"] > 0))
    np.testing.assert_allclose(logjac, s.variables["a"], rtol=1e-5)


def test_logdensity_matches_manual(key):
    obs = jnp.float32(1.2)
    model = synthetic_posterior(obs)
    s = model.sample_prior(key, 16)
    out = model.logdensity_sample(s)
    # manual: log p(a) + logjac + log p(b) + log p(c | a+b)
    a_log = s.variables["a"]
    a = jnp.exp(a_log)
    b = s.variables["b"]
    manual_prior = Exponential(1.0).logpdf(a) + a_log + Normal(0.0, 1.0).logpdf(b)
    manual_like = Normal(a + b, 0.1).logpdf(obs)
    np.testing.assert_allclose(out.log_like, manual_like, rtol=1e-4)
    np.testing.assert_allclose(out.log_prob, manual_prior + manual_like, rtol=1e-4, atol=1e-4)


def test_tempered_logdensity_guards():
    lp = jnp.array([1.0, 2.0])
    ll = jnp.array([-jnp.inf, 5.0])
    # phi=0: prior only, no nan from 0 * -inf
    out0 = tempered_logdensity(lp, ll, 0.0)
    np.testing.assert_allclose(out0, lp)
    out1 = tempered_logdensity(lp, ll, 1.0)
    assert out1[0] == -jnp.inf and out1[1] == pytest.approx(7.0)
    outh = tempered_logdensity(lp, ll, 0.5)
    assert outh[1] == pytest.approx(4.5)


def test_modifier_node(key):
    obs = jnp.float32(1.0)
    a = BroadcastedNode("a", Normal, 0.0, 1.0)
    c_raw = BroadcastedNode("c", Normal, a, 0.1) | obs
    c = ModifierNode(c_raw, lambda ell, values: 2.0 * ell)
    model = PosteriorModel(c)
    s = model.sample_prior(key, 8)
    out = model.logdensity_sample(s)
    manual = Normal(s.variables["a"], 0.1).logpdf(obs)
    np.testing.assert_allclose(out.log_like, 2.0 * manual, rtol=1e-5)


# ---------------------------------------------------------------------------
# Proposals (mirrors /root/reference/test/proposals.jl contracts)
# ---------------------------------------------------------------------------


def _posterior_for_proposals():
    return synthetic_posterior(jnp.float32(1.0))


def test_symmetric_proposal_contract(key):
    model = _posterior_for_proposals()
    prop_graph = sequentialize(BroadcastedNode("b", Normal, 0.0, 0.1))
    q = symmetric_proposal(prop_graph, model)
    prev = model.sample_prior(key, 32)
    new = propose(jax.random.PRNGKey(1), q, prev)
    assert new.variables["b"].shape == (32,)
    # only b moved
    np.testing.assert_allclose(new.variables["a"], prev.variables["a"])
    assert bool(jnp.any(new.variables["b"] != prev.variables["b"]))
    # symmetric transition prob == 0
    assert float(transition_probability(q, new, prev)) == 0.0


def test_additive_proposal_transition(key):
    model = _posterior_for_proposals()
    prop_graph = sequentialize(BroadcastedNode("b", Normal, 0.0, 0.5))
    q = additive_proposal(prop_graph, model)
    prev = model.sample_prior(key, 16)
    new = propose(jax.random.PRNGKey(1), q, prev)
    tp = transition_probability(q, new, prev)
    manual = Normal(0.0, 0.5).logpdf(new.variables["b"] - prev.variables["b"])
    np.testing.assert_allclose(tp, manual, rtol=1e-4)


def test_independent_proposal(key):
    model = _posterior_for_proposals()
    prop_graph = sequentialize(BroadcastedNode("a", Exponential, 2.0))
    q = independent_proposal(prop_graph, model)
    prev = model.sample_prior(key, 16)
    new = propose(jax.random.PRNGKey(1), q, prev)
    # independent of previous
    assert bool(jnp.all(new.variables["a"] != prev.variables["a"]))
    np.testing.assert_allclose(new.variables["b"], prev.variables["b"])
    # transition prob includes the logjac of the proposal bijector
    tp = transition_probability(q, new, prev)
    a_uncon = new.variables["a"]
    manual = Exponential(2.0).logpdf(jnp.exp(a_uncon)) + a_uncon
    np.testing.assert_allclose(tp, manual, rtol=1e-4, atol=1e-4)


def test_quaternion_proposal_tangent(key):
    """Quaternion variables move on the manifold and stay normalized."""
    from bayesianposeestimation.jl_tpu.distributions import QuaternionUniform

    a = BroadcastedNode("r", QuaternionUniform)
    mean = DeterministicNode("m", lambda r: r[..., 0], a)
    c = BroadcastedNode("c", Normal, mean, 0.1) | jnp.float32(0.5)
    model = PosteriorModel(c)
    assert model.quaternion_names == ("r",)
    prop_graph = sequentialize(BroadcastedNode("r", Normal, 0.0, (0.1, 0.1, 0.1)))
    q = symmetric_proposal(prop_graph, model)
    prev = model.sample_prior(key, 10)
    new = propose(jax.random.PRNGKey(2), q, prev)
    assert new.variables["r"].shape == (10, 4)
    np.testing.assert_allclose(jnp.linalg.norm(new.variables["r"], axis=-1), 1.0, atol=1e-5)
    assert bool(jnp.all(jnp.abs(new.variables["r"] - prev.variables["r"]) < 0.3))
