"""Pallas kernel micro-profiler: where does the time per pose go?

Measures (min over repeats, whole batches scanned in one dispatch — see
CLAUDE.md interference notes):
  * render-only vs fused render+score (epilogue cost)
  * chunk-size sweep at fixed work (per-dot overhead vs VMEM pressure)
  * batch-size sweep (per-program overhead amortization)
  * face/pixel scaling (dot-dominated or not)

    python scripts/kernel_profile.py
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1600)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bayesianposeestimation.jl_tpu import quaternions as quat
    from bayesianposeestimation.jl_tpu.camera import CvCamera
    from bayesianposeestimation.jl_tpu.models.fused import make_score_fn
    from bayesianposeestimation.jl_tpu.ops.pallas_raster import (
        pallas_render_depth,
        pallas_render_score,
    )
    from bayesianposeestimation.jl_tpu.parameters import Parameters
    from bayesianposeestimation.jl_tpu.utils import mesh_io

    print(f"devices: {jax.devices()}")
    # interference probe
    x = jnp.zeros(8)
    f = jax.jit(lambda v: v + 1)
    probe = measure(f, x, reps=10)
    print(f"tiny dispatch: {probe*1e3:.2f} ms ({'CLEAN' if probe < 1e-3 else 'POLLUTED'})")

    mesh = mesh_io.icosphere_mesh(0.06, 3)  # 1280 faces
    cam = CvCamera(width=30, height=30, f_x=36.0, f_y=36.0, c_x=14.5, c_y=14.5)
    params = Parameters()
    score_fn = make_score_fn(params, "association")
    key = jax.random.PRNGKey(0)
    n = args.n
    t = jnp.array([0.0, 0.0, 1.0]) + 0.02 * jax.random.normal(key, (n, 3))
    q = quat.qnormalize(jax.random.normal(jax.random.PRNGKey(1), (n, 4)))
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    z_img = jnp.ones((30, 30))

    def render_only(t, q, chunk=None):
        return pallas_render_depth(verts, faces, cam, t, q, chunk=chunk)

    def render_score(t, q, chunk=None):
        return pallas_render_score(verts, faces, cam, t, q, z_img, 0.7,
                                   score_fn, chunk=chunk)

    base = measure(jax.jit(lambda t, q: render_score(t, q)), t, q)
    print(f"\nfused render+score, n={n}, 1280 faces, 30x30: "
          f"{base/n*1e6:.2f} us/pose ({n/base:,.0f} poses/s)")
    ro = measure(jax.jit(lambda t, q: render_only(t, q)), t, q)
    print(f"render-only (returns [N,H,W] to HBM):        {ro/n*1e6:.2f} us/pose")

    print("\nchunk sweep (fused):")
    for chunk in (128, 256, 384, 640, 1280):
        tt = measure(jax.jit(lambda t, q, c=chunk: render_score(t, q, c)), t, q)
        print(f"  chunk {chunk:5d}: {tt/n*1e6:7.2f} us/pose")

    print("\nbatch-size sweep (fused, chunk auto):")
    for nn in (100, 400, 1600, 6400):
        tn = jnp.array([0.0, 0.0, 1.0]) + 0.02 * jax.random.normal(key, (nn, 3))
        qn = quat.qnormalize(jax.random.normal(jax.random.PRNGKey(1), (nn, 4)))
        tt = measure(jax.jit(lambda a, b: render_score(a, b)), tn, qn)
        print(f"  n {nn:5d}: {tt/nn*1e6:7.2f} us/pose")

    print("\nmesh-size sweep (fused, n=1600):")
    for sub, label in ((2, "320"), (3, "1280"), (4, "5120")):
        m = mesh_io.icosphere_mesh(0.06, sub)
        v2, f2 = jnp.asarray(m.vertices), jnp.asarray(m.faces)

        def rs(a, b, v2=v2, f2=f2):
            return pallas_render_score(v2, f2, cam, a, b, z_img, 0.7, score_fn)

        tt = measure(jax.jit(rs), t, q)
        print(f"  {label:>5s} faces: {tt/n*1e6:7.2f} us/pose")

    print("\npixel sweep (fused, n=1600, 1280 faces):")
    for side in (16, 30, 64, 128):
        cam2 = CvCamera(width=side, height=side, f_x=1.2 * side, f_y=1.2 * side,
                        c_x=(side - 1) / 2, c_y=(side - 1) / 2)
        z2 = jnp.ones((side, side))

        def rs2(a, b, cam2=cam2, z2=z2):
            return pallas_render_score(verts, faces, cam2, a, b, z2, 0.7,
                                       score_fn)

        tt = measure(jax.jit(rs2), t, q)
        print(f"  {side:3d}x{side:<3d}: {tt/n*1e6:7.2f} us/pose")


if __name__ == "__main__":
    main()
