"""Sampling a constrained distribution through unconstrained proposals.

Parity target: /root/reference/scripts/simple_logjac.jl — minimal example
sampling a known Exponential through proposals that live in unconstrained
log-space: the recovered histogram only matches the true pdf if the bijector
log-Jacobian is applied (simple_logjac.jl:7-58). Runs a symmetric random-walk
MH, an independent-Normal MH, and their composition, and plots histogram vs
true density to plots/simple_logjac.pdf.

    python scripts/simple_logjac.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bayesianposeestimation.jl_tpu.distributions import Exponential, Normal
from bayesianposeestimation.jl_tpu.graph import (
    BroadcastedNode,
    DeterministicNode,
    sequentialize,
)
from bayesianposeestimation.jl_tpu.posterior import PosteriorModel
from bayesianposeestimation.jl_tpu.proposals import (
    independent_proposal,
    symmetric_proposal,
)
from bayesianposeestimation.jl_tpu.samplers import (
    ComposedSampler,
    MetropolisHastings,
    sample_chain,
)
from bayesianposeestimation.jl_tpu.tempering import ConstantSchedule


def target_model(theta):
    """Posterior == Exponential(theta) prior (constant likelihood)."""
    z = BroadcastedNode("z", Exponential, theta)
    m = DeterministicNode("m", lambda z: 0.0 * z, z)
    y = BroadcastedNode("y", Normal, m, 1.0) | jnp.float32(0.0)
    return PosteriorModel(y)


def run(key, model, sampler, label, theta):
    outs, _ = sample_chain(key, model, sampler, n_steps=10_000, n_particles=8,
                           collect_vars=("z",), n_burn_in=500, collect_every=5)
    z = np.exp(np.asarray(outs["z"]).ravel())  # unconstrained -> model domain
    mean_err = abs(z.mean() - theta) / theta
    print(f"{label}: mean {z.mean():.3f} (target {theta}), rel err {mean_err:.3f}")
    return z


def main():
    theta = 3.0
    model = target_model(theta)
    key = jax.random.PRNGKey(0)

    sym = MetropolisHastings(
        symmetric_proposal(sequentialize(BroadcastedNode("z", Normal, 0.0, 0.1)),
                           model), ConstantSchedule())
    ind = MetropolisHastings(
        independent_proposal(sequentialize(BroadcastedNode("z", Normal, 0.0, 1.5)),
                             model), ConstantSchedule())
    com = ComposedSampler((sym, ind), weights=(0.5, 0.5))

    keys = jax.random.split(key, 3)
    results = {
        "symmetric RW": run(keys[0], model, sym, "symmetric RW", theta),
        "independent": run(keys[1], model, ind, "independent", theta),
        "composed": run(keys[2], model, com, "composed", theta),
    }

    from bayesianposeestimation.jl_tpu.utils.visualization import diss_defaults, _plt
    diss_defaults()
    plt = _plt()
    fig, axes = plt.subplots(1, 3, figsize=(9, 2.8), sharey=True)
    xs = np.linspace(0, 15, 200)
    pdf = np.exp(-xs / theta) / theta
    for ax, (label, z) in zip(axes, results.items()):
        ax.hist(z[z < 15], bins=np.arange(0, 15.5, 0.5), density=True, alpha=0.6)
        ax.plot(xs, pdf, lw=2)
        ax.set_title(label)
        ax.set_xlabel("z")
    Path("plots").mkdir(exist_ok=True)
    fig.tight_layout()
    fig.savefig("plots/simple_logjac.pdf")
    print("wrote plots/simple_logjac.pdf")


if __name__ == "__main__":
    main()
