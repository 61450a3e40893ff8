"""Statistical sampler-correctness validation.

Parity target: /root/reference/scripts/simple_logjac.jl:7-30 — sample a known
constrained distribution (Exponential) through unconstrained-domain proposals
and verify the recovered marginal, exercising the bijector logjac path end to
end. The reference compares a histogram to the true pdf; here a
Kolmogorov-Smirnov test does the same quantitatively.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from bayesianposeestimation.jl_tpu.distributions import Exponential, Normal
from bayesianposeestimation.jl_tpu.graph import BroadcastedNode, sequentialize
from bayesianposeestimation.jl_tpu.posterior import PosteriorModel
from bayesianposeestimation.jl_tpu.proposals import symmetric_proposal
from bayesianposeestimation.jl_tpu.samplers import MetropolisHastings, sample_chain
from bayesianposeestimation.jl_tpu.tempering import ConstantSchedule


def test_exponential_recovered_through_unconstrained_proposals(key):
    """MH random walk in log-space must leave Exponential(θ=0.8) invariant —
    only correct if the logjac correction is applied (Samples.jl:66-72)."""
    theta = 0.8
    # prior IS the target: the observation is constant in `a`, so the
    # posterior equals the Exponential prior
    from bayesianposeestimation.jl_tpu.graph import DeterministicNode

    a = BroadcastedNode("a", Exponential, theta)
    m = DeterministicNode("m", lambda a: 0.0 * a, a)
    y = BroadcastedNode("y", Normal, m, 1.0) | jnp.float32(0.0)
    model = PosteriorModel(y)

    q = symmetric_proposal(sequentialize(BroadcastedNode("a", Normal, 0.0, 0.7)), model)
    sampler = MetropolisHastings(q, ConstantSchedule())
    outs, _ = sample_chain(key, model, sampler, n_steps=3000, n_particles=32,
                           collect_vars=("a",), n_burn_in=500, collect_every=10)
    # unconstrained -> model domain
    a_samples = np.exp(np.asarray(outs["a"]).ravel())
    ks = stats.kstest(a_samples, "expon", args=(0, theta))
    # with autocorrelation the effective n is lower; test the distributional
    # shape rather than exact p-values
    assert ks.statistic < 0.05, f"KS statistic {ks.statistic}"
    assert np.mean(a_samples) == pytest_approx(theta, 0.1)


def pytest_approx(x, rel):
    import pytest

    return pytest.approx(x, rel=rel)


def test_burn_in_and_thinning_shapes(key):
    x = BroadcastedNode("x", Normal, 0.0, 1.0)
    y = BroadcastedNode("y", Normal, x, 0.5) | jnp.float32(1.0)
    model = PosteriorModel(y)
    q = symmetric_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 0.5)), model)
    sampler = MetropolisHastings(q, ConstantSchedule())
    outs, _ = sample_chain(key, model, sampler, n_steps=101, n_particles=4,
                           collect_vars=("x",), n_burn_in=20, collect_every=4)
    assert outs["x"].shape == (20, 4)  # (100 - 20) / 4
