"""TPU verify: dual depth-layout kernel change (depth_in_dot policy).

Drives the public surface on the real TPU:
1. pallas dense/paired renders vs the XLA rasterizer at 30px (in-dot) and
   50px (reconstruction) — pixel parity.
2. cross-layout parity at both resolutions.
3. fused score path at the flagship config, both layouts.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

print(jax.devices())

from bayesianposeestimation.jl_tpu import quaternions as quat
from bayesianposeestimation.jl_tpu.camera import CvCamera, crop_camera
from bayesianposeestimation.jl_tpu.models.fused import make_score_fn
from bayesianposeestimation.jl_tpu.ops.pallas_raster import (
    antipodal_pair_faces, pallas_render_depth, pallas_render_score)
from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth_batch
from bayesianposeestimation.jl_tpu.parameters import Parameters
from bayesianposeestimation.jl_tpu.utils import mesh_io

# clean-window probe
f = jax.jit(lambda x: x + 1)
x = jnp.ones((8, 128))
f(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(10):
    f(x).block_until_ready()
print(f"probe {(time.perf_counter()-t0)/10*1e3:.3f} ms/dispatch")

mesh = mesh_io.monkey_mesh(0.08)
verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
base = CvCamera(width=640, height=480, f_x=600.0, f_y=600.0, c_x=319.5,
                c_y=239.5, near=0.01, far=10.0)
key = jax.random.PRNGKey(3)
n = 64
q = quat.rand_quaternion(key, (n,))
t = jnp.array([0.0, 0.0, 1.0]) + 0.03 * jax.random.normal(key, (n, 3))

for res in (30, 50):
    cam = crop_camera(base, np.array([0.0, 0.0, 1.0]),
                      mesh_io.mesh_diameter(mesh), width=res, height=res)
    ref = np.asarray(render_depth_batch(verts, faces, cam, t, q,
                                        height=res, width=res))
    for did in (True, False):
        d = np.asarray(pallas_render_depth(verts, faces, cam, t, q,
                                           height=res, width=res,
                                           depth_in_dot=did))
        mism = np.mean((ref > 0) != (d > 0))
        both = (ref > 0) & (d > 0)
        rel = np.abs(d[both] - ref[both]) / ref[both]
        print(f"res {res} depth_in_dot={did}: cover-mismatch {mism:.2e} "
              f"depth p99 {np.percentile(rel, 99):.2e} max {rel.max():.2e}")
        assert mism < 5e-3 and np.percentile(rel, 99) < 1e-4

    # paired path vs dense, auto layout
    fp = antipodal_pair_faces(verts, faces)
    a = np.asarray(pallas_render_depth(verts, faces, cam, t, q,
                                       height=res, width=res))
    b = np.asarray(pallas_render_depth(verts, fp, cam, t, q,
                                       height=res, width=res, paired=True))
    mism = np.mean((a > 0) != (b > 0))
    both = (a > 0) & (b > 0)
    rel = np.abs(b[both] - a[both]) / a[both]
    print(f"res {res} paired-vs-dense: mismatch {mism:.2e} "
          f"rel max {rel.max():.2e}")
    assert mism < 1e-3 and rel.max() < 1e-3

    # fused score, both layouts
    params = Parameters(width=res, height=res)
    z = jnp.where(a[0] > 0, a[0], jnp.inf)
    fn = make_score_fn(params, "association")
    ell0, so0 = pallas_render_score(verts, faces, cam, t, q, z, 0.7, fn,
                                    height=res, width=res, depth_in_dot=True)
    ell1, so1 = pallas_render_score(verts, faces, cam, t, q, z, 0.7, fn,
                                    height=res, width=res, depth_in_dot=False)
    err = np.max(np.abs(np.asarray(ell0) - np.asarray(ell1))
                 / np.abs(np.asarray(ell0)))
    print(f"res {res} score cross-layout rel {err:.2e}")
    assert err < 1e-4

print("VERIFY OK")
