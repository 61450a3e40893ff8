"""Pallas kernel micro-profiler: where does the time per pose go?

The TPU tunnel has ~30 ms interference windows (CLAUDE.md), so wall-clock
per-dispatch timing is useless for <10 ms kernels. Instead every measurement
scans the kernel call R times inside ONE dispatch (with a data dependence
between iterations so XLA cannot hoist or CSE the call) and reports the
slope between two LONG repeat counts — constant dispatch overhead cancels
and interference amortizes. The slope is computed from the per-length
minima (min over reps of t_hi minus min over reps of t_lo); taking the min
of per-rep DIFFERENCES instead would select exactly the rep whose lo-scan
caught an interference window (the smallest, most wrong slope).

    python scripts/kernel_profile.py
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

R_LO, R_HI = 200, 2000


def make_scanned(fn, r):
    """Scan fn r times with an output->input data dependence."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(t, q):
        def body(carry, _):
            tc, qc = carry
            out = fn(tc, qc)
            leaf = jax.tree_util.tree_leaves(out)[0]
            bump = (leaf.reshape(-1)[0] * 0.0).astype(tc.dtype)
            return (tc + bump, qc), None

        (tf, _), _ = jax.lax.scan(body, (t, q), None, length=r)
        return tf

    return run


def slope_time(fn, t, q, reps=3):
    """Per-call seconds via the repeat-count slope (dispatch cancels)."""
    import jax

    lo, hi = make_scanned(fn, R_LO), make_scanned(fn, R_HI)
    jax.block_until_ready(lo(t, q))
    jax.block_until_ready(hi(t, q))
    best_lo = best_hi = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(lo(t, q))
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(hi(t, q))
        best_hi = min(best_hi, time.perf_counter() - t0)
    return (best_hi - best_lo) / (R_HI - R_LO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1600)
    ap.add_argument("--crop", type=int, default=None,
                    help="profile the raster-path decision matrix at this "
                         "crop side only (e.g. 50 — VERDICT r3 weak #4: "
                         "where does the 50 px config lose?)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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
    x = jnp.zeros(8)
    f = jax.jit(lambda v: v + 1)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        f(x).block_until_ready()
    probe = (time.perf_counter() - t0) / 10
    print(f"tiny dispatch: {probe*1e3:.2f} ms "
          f"({'CLEAN' if probe < 1e-3 else 'POLLUTED — slope method active'})")

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

    if args.crop:
        from bayesianposeestimation.jl_tpu.ops.pallas_raster import (
            antipodal_pair_faces,
            spatial_sort_faces,
        )

        side = args.crop
        cam2 = CvCamera(width=side, height=side, f_x=1.2 * side, f_y=1.2 * side,
                        c_x=(side - 1) / 2, c_y=(side - 1) / 2)
        z2 = jnp.ones((side, side))
        paired_faces = antipodal_pair_faces(verts, faces)
        f_half = paired_faces.shape[0] // 2

        def cfg(f2, **kw):
            def fn(t, q):
                return pallas_render_score(verts, f2, cam2, t, q, z2, 0.7,
                                           score_fn, **kw)
            return fn

        print(f"\nraster-path decision matrix at {side}x{side}, 1280 faces, "
              f"n={n} (us/pose):")
        rows = [("paired, auto chunk", cfg(paired_faces, paired=True))]
        for c in (128, 320, 640):
            if f_half % c == 0:
                rows.append((f"paired, chunk {c}",
                             cfg(paired_faces, paired=True, chunk=c)))
        sorted_faces = spatial_sort_faces(verts, faces)
        rows += [
            ("dense, auto chunk", cfg(sorted_faces)),
            ("dense + band_cull", cfg(sorted_faces, band_cull=True)),
            ("dense + compact", cfg(sorted_faces, compact=True)),
        ]
        for label, fn in rows:
            try:
                tt = slope_time(fn, t, q)
                print(f"  {label:24s}: {tt/n*1e6:7.2f}")
            except Exception as e:
                print(f"  {label:24s}: FAILED ({type(e).__name__}: {e})")
        return

    def fused(v2, f2, cam2, z2, chunk=None):
        def fn(t, q):
            return pallas_render_score(v2, f2, cam2, t, q, z2, 0.7, score_fn,
                                       chunk=chunk)
        return fn

    base = slope_time(fused(verts, faces, cam, z_img), t, q)
    print(f"\nfused render+score, n={n}, 1280 faces, 30x30: "
          f"{base/n*1e6:.2f} us/pose ({n/base:,.0f} poses/s)")
    ro = slope_time(lambda a, b: pallas_render_depth(verts, faces, cam, a, b), t, q)
    print(f"render-only (returns [N,H,W] to HBM):        {ro/n*1e6:.2f} us/pose")

    print("\nchunk sweep (fused):")
    for chunk in (128, 256, 384, 640, 1280):
        tt = slope_time(fused(verts, faces, cam, z_img, chunk), t, q)
        print(f"  chunk {chunk:5d}: {tt/n*1e6:7.2f} us/pose")

    print("\nbatch-size sweep (fused, chunk auto):")
    for nn in (100, 400, 1600):
        tn = jnp.array([0.0, 0.0, 1.0]) + 0.02 * jax.random.normal(key, (nn, 3))
        qn = quat.qnormalize(jax.random.normal(jax.random.PRNGKey(1), (nn, 4)))
        tt = slope_time(fused(verts, faces, cam, z_img), tn, qn)
        print(f"  n {nn:5d}: {tt/nn*1e6:7.2f} us/pose")

    print(f"\nmesh-size sweep (fused, n={n}):")
    for sub, label in ((1, "80"), (2, "320"), (3, "1280"), (4, "5120")):
        m = mesh_io.icosphere_mesh(0.06, sub)
        v2, f2 = jnp.asarray(m.vertices), jnp.asarray(m.faces)
        tt = slope_time(fused(v2, f2, cam, z_img), t, q)
        print(f"  {label:>5s} faces: {tt/n*1e6:7.2f} us/pose")

    print(f"\npixel sweep (fused, n={n}, 1280 faces):")
    for side in (16, 30, 64, 128):
        cam2 = CvCamera(width=side, height=side, f_x=1.2 * side, f_y=1.2 * side,
                        c_x=(side - 1) / 2, c_y=(side - 1) / 2)
        z2 = jnp.ones((side, side))
        tt = slope_time(fused(verts, faces, cam2, z2), t, q)
        print(f"  {side:3d}x{side:<3d}: {tt/n*1e6:7.2f} us/pose")

    print(f"\ntriangle compaction (fused, n={n}, 30x30):")
    for sub, label in ((3, "1280"), (4, "5120")):
        m = mesh_io.icosphere_mesh(0.06, sub)
        v2, f2 = jnp.asarray(m.vertices), jnp.asarray(m.faces)

        def fused_c(compact):
            def fn(t, q):
                return pallas_render_score(v2, f2, cam, t, q, z_img, 0.7,
                                           score_fn, compact=compact)
            return fn

        td = slope_time(fused_c(False), t, q)
        try:
            tc = slope_time(fused_c(True), t, q)
            print(f"  {label:>5s} faces: dense {td/n*1e6:6.2f} us/pose, "
                  f"compact {tc/n*1e6:6.2f} us/pose ({td/tc:.2f}x)")
        except Exception as e:  # VMEM overflow at large f_pad (S is [cap, f_pad])
            print(f"  {label:>5s} faces: dense {td/n*1e6:6.2f} us/pose, "
                  f"compact FAILED ({type(e).__name__})")


if __name__ == "__main__":
    main()
