"""Sampler tests on synthetic models: contracts + statistical recovery.

Mirrors /root/reference/test/mh.jl (acceptance statistics), test/smc.jl (all
kernel combinations, shapes/evidence), and the statistical-validation pattern
of /root/reference/scripts/simple_logjac.jl.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianposeestimation.jl_tpu.distributions import Exponential, Normal
from bayesianposeestimation.jl_tpu.graph import BroadcastedNode, DeterministicNode, sequentialize
from bayesianposeestimation.jl_tpu.posterior import PosteriorModel
from bayesianposeestimation.jl_tpu.proposals import independent_proposal, symmetric_proposal
from bayesianposeestimation.jl_tpu.samplers import (
    AdaptiveKernel,
    BootstrapKernel,
    ComposedSampler,
    CoordinateSampler,
    ForwardProposalKernel,
    Gibbs,
    MetropolisHastings,
    MhKernel,
    MultipleTry,
    SequentialMonteCarlo,
    sample_chain,
    systematic_resampling_indices,
)
from bayesianposeestimation.jl_tpu.samplers.smc import log_relative_ess, normalize_log_weights
from bayesianposeestimation.jl_tpu.tempering import ConstantSchedule, LinearSchedule


def gaussian_posterior(obs=1.0, sigma_obs=0.5):
    """x ~ N(0,1); y ~ N(x, σ) | obs — analytic posterior
    N(obs/(1+σ²), σ²/(1+σ²))."""
    x = BroadcastedNode("x", Normal, 0.0, 1.0)
    y = BroadcastedNode("y", Normal, x, sigma_obs) | jnp.float32(obs)
    return PosteriorModel(y)


def posterior_mean_std(obs, sigma):
    var = sigma**2 / (1 + sigma**2)
    return obs / (1 + sigma**2), np.sqrt(var)


def test_mh_acceptance_statistics(key):
    """~50% acceptance at log α = log 0.5 (parity: test/mh.jl:40-41)."""
    from bayesianposeestimation.jl_tpu.samplers.mh import select_sample
    from bayesianposeestimation.jl_tpu.samples import Sample

    n = 100_000
    prev = Sample({"x": jnp.zeros(n)}, jnp.zeros(n), jnp.zeros(n))
    prop = Sample({"x": jnp.ones(n)}, jnp.full(n, jnp.log(0.5)), jnp.zeros(n))
    model = gaussian_posterior()
    q = symmetric_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 1.0)), model)
    from bayesianposeestimation.jl_tpu.samplers.mh import mh_kernel

    out = mh_kernel(key, q, prop, prev)
    accept_rate = float(jnp.mean(out.variables["x"]))
    assert accept_rate == pytest.approx(0.5, abs=0.01)


def test_mh_recovers_gaussian_posterior(key):
    model = gaussian_posterior(obs=1.0, sigma_obs=0.5)
    q = symmetric_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 0.5)), model)
    sampler = MetropolisHastings(q, ConstantSchedule())
    outs, _ = sample_chain(key, model, sampler, n_steps=2000, n_particles=64,
                           collect_vars=("x",))
    xs = np.asarray(outs["x"][500:]).ravel()  # burn-in discard
    mean, std = posterior_mean_std(1.0, 0.5)
    assert np.mean(xs) == pytest.approx(mean, abs=0.02)
    assert np.std(xs) == pytest.approx(std, abs=0.02)


def test_systematic_resampling_distribution(key):
    log_w = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    counts = np.zeros(4)
    keys = jax.random.split(key, 200)
    for k in keys:
        idx = systematic_resampling_indices(k, log_w)
        counts += np.bincount(np.asarray(idx), minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def test_systematic_resampling_degenerate(key):
    # one particle has all the weight
    log_w = jnp.asarray([-jnp.inf, 0.0, -jnp.inf])
    idx = systematic_resampling_indices(key, log_w)
    assert np.all(np.asarray(idx) == 1)


def test_log_relative_ess():
    n = 8
    uniform = jnp.full((n,), -jnp.log(float(n)))
    assert float(log_relative_ess(uniform)) == pytest.approx(0.0, abs=1e-5)
    # degenerate: one particle -> ESS = 1 -> log(1/n)
    degenerate = jnp.log(jnp.asarray([1.0] + [1e-30] * (n - 1)))
    norm = normalize_log_weights(degenerate)
    assert float(log_relative_ess(norm)) == pytest.approx(np.log(1 / n), abs=1e-3)


@pytest.mark.parametrize("kernel_t", ["forward", "mh", "bootstrap", "adaptive_mh"])
def test_smc_kernels_step(kernel_t, key):
    """All kernel combinations step twice with consistent shapes/evidence
    (parity: test/smc.jl:44-79)."""
    model = gaussian_posterior()
    q = symmetric_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 0.3)), model)
    kernels = {
        "forward": ForwardProposalKernel(q),
        "mh": MhKernel(q),
        "bootstrap": BootstrapKernel(q),
        "adaptive_mh": AdaptiveKernel(MhKernel(q), {"x": 0.3}),
    }
    smc = SequentialMonteCarlo(kernels[kernel_t], LinearSchedule(10), 32, np.log(0.5))
    k1, k2, k3 = jax.random.split(key, 3)
    _, state = smc.init(k1, model)
    assert state.log_weights.shape == (32,)
    assert float(state.log_evidence) == 0.0
    s1, state = smc.step(k2, model, state)
    s2, state = smc.step(k3, model, state)
    assert s2.variables["x"].shape == (32,)
    assert np.isfinite(float(state.log_evidence))
    assert float(state.temperature) == pytest.approx(0.2, abs=1e-5)
    # normalized weights
    assert float(jax.scipy.special.logsumexp(state.log_weights)) == pytest.approx(0.0, abs=1e-4)


def test_smc_mh_recovers_posterior(key):
    """Tempered SMC-MH pushes particles to the analytic posterior."""
    model = gaussian_posterior(obs=1.0, sigma_obs=0.5)
    q = symmetric_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 0.3)), model)
    n_steps, n_particles = 300, 256
    smc = SequentialMonteCarlo(MhKernel(q), LinearSchedule(n_steps), n_particles, np.log(0.5))
    outs, final = sample_chain(key, model, smc, n_steps, collect_vars=("x",))
    xs = np.asarray(outs["x"][-1])
    w = np.exp(np.asarray(final.log_weights))
    mean, std = posterior_mean_std(1.0, 0.5)
    est_mean = float(np.sum(w * xs))
    est_std = float(np.sqrt(np.sum(w * (xs - est_mean) ** 2)))
    assert est_mean == pytest.approx(mean, abs=0.08)
    assert est_std == pytest.approx(std, abs=0.08)


def test_smc_evidence_gaussian(key):
    """Log evidence of the tempered SMC approximates the true marginal
    likelihood log p(y) of the conjugate Gaussian model."""
    obs, sigma = 1.0, 0.5
    model = gaussian_posterior(obs, sigma)
    q = symmetric_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 0.3)), model)
    n_steps = 400
    smc = SequentialMonteCarlo(MhKernel(q), LinearSchedule(n_steps), 512, np.log(0.5))
    _, final = sample_chain(key, model, smc, n_steps, collect_vars=("x",))
    # p(y) = N(y; 0, 1 + σ²)
    from scipy import stats

    true_log_ev = stats.norm.logpdf(obs, 0.0, np.sqrt(1 + sigma**2))
    assert float(final.log_evidence) == pytest.approx(true_log_ev, abs=0.1)


def test_mtm_step_and_recovery(key):
    model = gaussian_posterior(obs=1.0, sigma_obs=0.5)
    q = symmetric_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 0.5)), model)
    mtm = MultipleTry(q, 8, ConstantSchedule())
    outs, _ = sample_chain(key, model, mtm, n_steps=1500, n_particles=32,
                           collect_vars=("x",))
    xs = np.asarray(outs["x"][300:]).ravel()
    mean, std = posterior_mean_std(1.0, 0.5)
    assert np.mean(xs) == pytest.approx(mean, abs=0.03)
    assert np.std(xs) == pytest.approx(std, abs=0.03)


def test_mtm_independent(key):
    model = gaussian_posterior(obs=1.0, sigma_obs=0.5)
    q = independent_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 1.0)), model)
    mtm = MultipleTry(q, 8, ConstantSchedule())
    outs, _ = sample_chain(key, model, mtm, n_steps=1500, n_particles=32,
                           collect_vars=("x",))
    xs = np.asarray(outs["x"][300:]).ravel()
    mean, std = posterior_mean_std(1.0, 0.5)
    assert np.mean(xs) == pytest.approx(mean, abs=0.03)
    assert np.std(xs) == pytest.approx(std, abs=0.04)


def test_composed_sampler(key):
    model = gaussian_posterior(obs=1.0, sigma_obs=0.5)
    q1 = symmetric_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 0.2)), model)
    q2 = symmetric_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 1.0)), model)
    sampler = ComposedSampler(
        (MetropolisHastings(q1, ConstantSchedule()), MetropolisHastings(q2, ConstantSchedule())),
        (0.7, 0.3),
    )
    outs, _ = sample_chain(key, model, sampler, n_steps=1500, n_particles=32,
                           collect_vars=("x",))
    xs = np.asarray(outs["x"][300:]).ravel()
    mean, std = posterior_mean_std(1.0, 0.5)
    assert np.mean(xs) == pytest.approx(mean, abs=0.03)


def test_coordinate_sampler_two_blocks(key):
    """Two variables updated block-wise each step."""
    x = BroadcastedNode("x", Normal, 0.0, 1.0)
    z = BroadcastedNode("z", Normal, 0.0, 1.0)
    s = DeterministicNode("s", lambda x, z: x + z, x, z)
    y = BroadcastedNode("y", Normal, s, 0.5) | jnp.float32(1.0)
    model = PosteriorModel(y)
    qx = symmetric_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 0.4)), model)
    qz = symmetric_proposal(sequentialize(BroadcastedNode("z", Normal, 0.0, 0.4)), model)
    sampler = CoordinateSampler(
        (MetropolisHastings(qx, ConstantSchedule()), MetropolisHastings(qz, ConstantSchedule()))
    )
    outs, _ = sample_chain(key, model, sampler, n_steps=1200, n_particles=32,
                           collect_vars=("x", "z"))
    # posterior of x+z given y=1, prior N(0,2), noise 0.25:
    # mean = 1 * 2/(2+0.25) = 0.888
    s_samples = np.asarray(outs["x"][300:] + outs["z"][300:]).ravel()
    assert np.mean(s_samples) == pytest.approx(2 / 2.25, abs=0.05)


def test_gibbs_sampler(key):
    """Gibbs with the exact conditional: x | y ~ N(y/(1+σ²), σ²/(1+σ²))."""
    obs, sigma = 1.0, 0.5
    model = gaussian_posterior(obs, sigma)
    mean, std = posterior_mean_std(obs, sigma)
    cond = sequentialize(BroadcastedNode("x", Normal, float(mean), float(std)))
    sampler = Gibbs(cond, ConstantSchedule())
    outs, _ = sample_chain(key, model, sampler, n_steps=500, n_particles=64,
                           collect_vars=("x",))
    xs = np.asarray(outs["x"][100:]).ravel()
    assert np.mean(xs) == pytest.approx(mean, abs=0.02)
    assert np.std(xs) == pytest.approx(std, abs=0.02)


def test_mtm_independent_subset_variables(key):
    """Regression: independent-proposal MTM over a SUBSET of variables must
    broadcast untouched variables exactly once (double broadcast exploded
    shapes when n_tries == n_chains)."""
    x = BroadcastedNode("x", Normal, 0.0, 1.0)
    z = BroadcastedNode("z", Normal, 0.0, 1.0)
    s = DeterministicNode("s", lambda x, z: x + z, x, z)
    y = BroadcastedNode("y", Normal, s, 0.5) | jnp.float32(1.0)
    model = PosteriorModel(y)
    q = independent_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 1.0)), model)
    n = 8  # n_tries == n_chains, the aliasing case
    mtm = MultipleTry(q, n, ConstantSchedule())
    outs, _ = sample_chain(key, model, mtm, n_steps=50, n_particles=n,
                           collect_vars=("x", "z"))
    assert outs["x"].shape == (49, n)
    assert np.isfinite(np.asarray(outs["log_prob"])).all()
