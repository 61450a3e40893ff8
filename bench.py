"""Headline benchmark: rendered+scored pose hypotheses per second per chip.

Runs the flagship configuration — tempered SMC-MH (the reference's BOP
submission sampler, /root/reference/scripts/smc_bop_val.jl:34-39) with the
association posterior on the monkey-class mesh (~1.3k faces) at the
reference's 30x30 / 100-particle setting — as ONE lax.scan device program and
reports hypotheses/sec. Baseline: the reference's implied throughput is
~10^4-10^5 hypotheses/s/GPU (BASELINE.md); vs_baseline is computed against
1e5/s (the north-star floor).

Prints exactly one JSON line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BASELINE_HYP_PER_SEC = 1.0e5


def clean_window_dispatch_ms(jax, jnp):
    """Measure tiny-dispatch latency; >1ms means the TPU tunnel is in an
    interference window (see .claude/skills/verify/SKILL.md)."""
    f = jax.jit(lambda x: x + 1)
    x = jnp.ones((8, 128))
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        f(x).block_until_ready()
    return (time.perf_counter() - t0) / 10 * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bayesianposeestimation.jl_tpu import quaternions as quat
    from bayesianposeestimation.jl_tpu.camera import CvCamera, crop_camera
    from bayesianposeestimation.jl_tpu.models import experiment_samplers as es
    from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth
    from bayesianposeestimation.jl_tpu.parameters import Experiment, Parameters
    from bayesianposeestimation.jl_tpu.samplers import sample_chain
    from bayesianposeestimation.jl_tpu.utils import mesh_io

    n_steps, n_particles = 500, 100
    params = Parameters(n_steps=n_steps, n_particles=n_particles,
                        proposal_sigma_r=(0.5, 0.5, 0.5))
    mesh = mesh_io.monkey_mesh(0.08)
    base = CvCamera(width=640, height=480, f_x=600.0, f_y=600.0, c_x=319.5, c_y=239.5,
                    near=0.01, far=10.0)
    cam = crop_camera(base, np.array([0.01, -0.02, 1.0]), mesh_io.mesh_diameter(mesh),
                      width=30, height=30)
    scene = {"camera": cam, "verts": jnp.asarray(mesh.vertices),
             "faces": jnp.asarray(mesh.faces)}
    key = jax.random.PRNGKey(0)
    k_gt, k_noise, k_chain = jax.random.split(key, 3)
    gt_t = jnp.array([0.01, -0.02, 1.0])
    gt_q = quat.rand_quaternion(k_gt)
    clean = render_depth(scene["verts"], scene["faces"], cam, gt_t, gt_q)
    obs = jnp.where(clean > 0, clean + 0.01 * jax.random.normal(k_noise, clean.shape), 0.0)
    experiment = Experiment(scene=scene, prior_o=params.o_mask_is, prior_t=gt_t,
                            depth_image=obs)
    from bayesianposeestimation.jl_tpu.models.fused import fused_posterior

    posterior = fused_posterior(params, experiment, "association")
    sampler = es.smc_mh(params, posterior)

    def run():
        outs, final = sample_chain(k_chain, posterior, sampler, n_steps, n_particles,
                                   collect_vars=("t", "r"))
        jax.block_until_ready(outs)
        return outs

    run()  # compile
    # take the best of several trials to dodge tunnel interference windows
    best_dt = float("inf")
    trials = 0
    while trials < 5:
        t0 = time.perf_counter()
        outs = run()
        dt = time.perf_counter() - t0
        best_dt = min(best_dt, dt)
        trials += 1
        if clean_window_dispatch_ms(jax, jnp) < 1.0 and trials >= 3:
            break

    n_hyp = n_steps * n_particles
    value = n_hyp / best_dt
    print(json.dumps({
        "metric": "rendered+scored pose hypotheses/sec/chip (smc_mh, association_posterior, 1280-face mesh, 30x30, 100 particles)",
        "value": round(value, 1),
        "unit": "hypotheses/s",
        "vs_baseline": round(value / BASELINE_HYP_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
