"""End-to-end demo: recover a 6-DoF pose from one synthetic depth image.

Mirrors /root/reference/scripts/demo_inference.jl: render a ground-truth pose
of a mesh, add sensor noise, build a posterior (simple/association/smooth) and
run a sampler (smc_mh by default); report translation/rotation errors.

Usage: python scripts/demo_inference.py [--sampler smc_mh] [--posterior simple_posterior]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sampler", default="smc_mh",
                    choices=["smc_mh", "smc_forward", "smc_bootstrap", "mh_sampler",
                             "mh_local_sampler", "mtm_sampler", "mtm_local_sampler"])
    ap.add_argument("--posterior", default="simple_posterior",
                    choices=["simple_posterior", "association_posterior",
                             "association_simple_reg", "smooth_posterior",
                             "smooth_simple_reg", "smooth_simple_posterior"])
    ap.add_argument("--mesh", default="monkey", choices=["cube", "monkey", "icosphere"])
    ap.add_argument("--n-steps", type=int, default=300)
    ap.add_argument("--n-particles", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fused", action="store_true",
                    help="use the fused Pallas render+score kernel")
    args = ap.parse_args()

    from bayesianposeestimation.jl_tpu import quaternions as quat
    from bayesianposeestimation.jl_tpu.camera import CvCamera
    from bayesianposeestimation.jl_tpu.models import experiment_models as em
    from bayesianposeestimation.jl_tpu.models import experiment_samplers as es
    from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth
    from bayesianposeestimation.jl_tpu.parameters import Experiment, Parameters
    from bayesianposeestimation.jl_tpu.samplers import sample_chain
    from bayesianposeestimation.jl_tpu.utils import mesh_io

    # σ_r = 0.5: SO(3) exploration needs large tangent moves (the reference's
    # BOP hyperopt found proposal_σ_r = π, scripts/smc_bop_val.jl:36-39)
    params = Parameters(n_steps=args.n_steps, n_particles=args.n_particles,
                        proposal_sigma_r=(0.5, 0.5, 0.5))
    mesh = {"cube": lambda: mesh_io.cube_mesh(0.1),
            "monkey": lambda: mesh_io.monkey_mesh(0.08),
            "icosphere": lambda: mesh_io.icosphere_mesh(0.05)}[args.mesh]()
    # BOP-style: a VGA base camera cropped around the prior position so the
    # object fills the render patch (the reference's crop_camera usage at
    # scripts/demo_inference.jl:91)
    from bayesianposeestimation.jl_tpu.camera import crop_camera
    base_cam = CvCamera(width=640, height=480, f_x=600.0, f_y=600.0,
                        c_x=319.5, c_y=239.5, near=0.01, far=10.0)
    diameter = mesh_io.mesh_diameter(mesh)
    cam = crop_camera(base_cam, np.array([0.01, -0.02, 1.0]), diameter,
                      width=params.width, height=params.height)
    scene = {"camera": cam, "verts": jnp.asarray(mesh.vertices), "faces": jnp.asarray(mesh.faces)}

    key = jax.random.PRNGKey(args.seed)
    k_gt, k_noise, k_chain = jax.random.split(key, 3)

    # ground-truth pose + synthetic noisy observation
    gt_t = jnp.array([0.01, -0.02, 1.0])
    gt_q = quat.rand_quaternion(k_gt)
    clean = render_depth(scene["verts"], scene["faces"], cam, gt_t, gt_q)
    noise = params.pixel_sigma * jax.random.normal(k_noise, clean.shape)
    obs = jnp.where(clean > 0, clean + noise, 0.0)  # background invalid (0 -> inf in Experiment)

    experiment = Experiment(scene=scene, prior_o=params.o_mask_is, prior_t=gt_t,
                            depth_image=obs)
    if args.fused:
        from bayesianposeestimation.jl_tpu.models.fused import fused_posterior

        variant = args.posterior.replace("_posterior", "").replace("simple", "simple")
        variant = {"simple_posterior": "simple", "association_posterior": "association",
                   "association_simple_reg": "association_simple_reg",
                   "smooth_posterior": "smooth", "smooth_simple_reg": "smooth_simple_reg",
                   "smooth_simple_posterior": "smooth_simple"}[args.posterior]
        posterior = fused_posterior(params, experiment, variant)
    else:
        prior = em.point_prior(params, experiment)
        posterior = getattr(em, args.posterior)(params, experiment, prior)
    sampler = getattr(es, args.sampler)(params, posterior)

    print(f"devices: {jax.devices()}")
    print(f"mesh: {mesh}, sampler: {args.sampler}, posterior: {args.posterior}")
    t0 = time.perf_counter()
    outs, final = sample_chain(k_chain, posterior, sampler, params.n_steps,
                               params.n_particles, collect_vars=("t", "r"))
    jax.block_until_ready(outs)
    t_compile_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs, final = sample_chain(k_chain, posterior, sampler, params.n_steps,
                               params.n_particles, collect_vars=("t", "r"))
    jax.block_until_ready(outs)
    t_run = time.perf_counter() - t0

    # best pose: max log-likelihood over final particles (parity:
    # /root/reference/scripts/smc_bop_val.jl:103-105)
    ll = np.asarray(outs["log_like"][-1])
    best = int(np.argmax(ll))
    est_t = np.asarray(outs["t"][-1][best])
    est_q = np.asarray(outs["r"][-1][best])
    t_err = float(np.linalg.norm(est_t - np.asarray(gt_t)))
    r_err = float(2 * quat.quat_dist(jnp.asarray(est_q), gt_q))  # full rotation angle

    n_hyp = params.n_steps * params.n_particles
    print(f"first run (incl. compile): {t_compile_run:.2f}s; steady: {t_run:.3f}s")
    print(f"throughput: {n_hyp / t_run:,.0f} rendered+scored hypotheses/s")
    print(f"translation error: {t_err * 1000:.1f} mm")
    print(f"rotation error: {np.degrees(r_err):.1f} deg")
    if hasattr(final, "log_evidence"):
        print(f"log evidence: {float(final.log_evidence):.1f}")
    ok = t_err < 0.05
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
