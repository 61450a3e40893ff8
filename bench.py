"""Headline benchmark: rendered+scored pose hypotheses per second per chip.

Runs the flagship configuration — tempered SMC-MH (the reference's BOP
submission sampler, /root/reference/scripts/smc_bop_val.jl:34-39) with the
association posterior on the monkey-class mesh (~1.3k faces) at the
reference's 30x30 / 100-particle setting — as ONE lax.scan device program and
reports hypotheses/sec. Baseline: the reference's implied throughput is
~10^4-10^5 hypotheses/s/GPU (BASELINE.md); vs_baseline is computed against
1e5/s (the north-star floor).

Wedge resilience: the axon TPU tunnel wedges for 10-60+ min stretches
(fresh processes block inside jax init or raise UNAVAILABLE, and it flaps).
The measurement therefore runs in a CHILD process under a timeout; the
parent retries with sleeps and prints the one JSON line from the first
successful attempt. Importing this module performs no device work.

Prints exactly one JSON line on success (rc 0); rc 1 only if every attempt
inside the retry budget failed.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BASELINE_HYP_PER_SEC = 1.0e5

# Retry policy (CLAUDE.md wedge recipe): bounded total wall budget, child
# timeout long enough for compile (~40s) + 5 trials, sleeps between attempts.
# Env-overridable for tests.
TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", 4200.0))
CHILD_TIMEOUT_S = float(os.environ.get("BENCH_CHILD_TIMEOUT_S", 900.0))
RETRY_SLEEP_S = float(os.environ.get("BENCH_RETRY_SLEEP_S", 120.0))


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


def measure():
    import jax
    import jax.numpy as jnp
    import numpy as np

    # Refuse to silently fall back to CPU if the axon tunnel flaps: the
    # headline is a per-chip TPU number (allow explicit CPU for smoke tests).
    dev = jax.devices()[0]
    if os.environ.get("BENCH_ALLOW_CPU") != "1":
        kind = f"{dev.platform} {getattr(dev, 'device_kind', '')}".lower()
        assert "tpu" in kind, f"expected a TPU device, got {dev!r}"

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
        run()
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


def main():
    deadline = time.monotonic() + TOTAL_BUDGET_S
    attempt = 0
    last_err = ""
    while time.monotonic() < deadline:
        attempt += 1
        budget = max(1.0, min(CHILD_TIMEOUT_S, deadline - time.monotonic()))
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--child"],
                capture_output=True, text=True, timeout=budget,
                env=dict(os.environ), cwd=str(Path(__file__).resolve().parent),
            )
        except subprocess.TimeoutExpired:
            last_err = f"attempt {attempt}: child timed out after {budget:.0f}s (tunnel wedge?)"
            print(last_err, file=sys.stderr)
        else:
            line = next((ln for ln in reversed(proc.stdout.splitlines())
                         if ln.startswith("{")), None)
            if proc.returncode == 0 and line is not None:
                print(line)
                return 0
            last_err = (f"attempt {attempt}: rc={proc.returncode}\n"
                        + proc.stderr[-1500:])
            print(last_err, file=sys.stderr)
        if time.monotonic() + RETRY_SLEEP_S + 60.0 >= deadline:
            break
        print(f"retrying in {RETRY_SLEEP_S:.0f}s "
              f"({deadline - time.monotonic():.0f}s left in budget)", file=sys.stderr)
        time.sleep(RETRY_SLEEP_S)
    print(f"bench: all attempts failed within {TOTAL_BUDGET_S:.0f}s budget; last:\n"
          f"{last_err}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv[1:]:
        measure()
    else:
        sys.exit(main())
