"""Scalar NumPy reference rasterizer — ground truth for the TPU rasterizer.

Deliberately naive (per-pixel loops, no vectorization tricks) so it is easy
to audit; mirrors the classic edge-function algorithm with perspective-correct
depth interpolation.
"""

import numpy as np


def golden_render_depth(verts, faces, cam, t, q, height, width):
    """verts [V,3], faces [F,3], t [3], q [4] (w,x,y,z) -> depth [H,W], bg=0."""
    w_, x_, y_, z_ = q
    R = np.array(
        [
            [1 - 2 * (y_**2 + z_**2), 2 * (x_ * y_ - w_ * z_), 2 * (x_ * z_ + w_ * y_)],
            [2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_**2 + z_**2), 2 * (y_ * z_ - w_ * x_)],
            [2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_), 1 - 2 * (x_**2 + y_**2)],
        ]
    )
    v_cam = verts @ R.T + np.asarray(t)
    z = v_cam[:, 2]
    u = cam.f_x * v_cam[:, 0] / z + cam.s * v_cam[:, 1] / z + cam.c_x
    v = cam.f_y * v_cam[:, 1] / z + cam.c_y

    depth = np.zeros((height, width))
    zbuf = np.full((height, width), np.inf)
    for f in faces:
        if np.any(z[f] <= cam.near):
            continue
        u0, u1, u2 = u[f]
        v0, v1, v2 = v[f]
        z0, z1, z2 = z[f]
        area = (u1 - u0) * (v2 - v0) - (v1 - v0) * (u2 - u0)
        if abs(area) < 1e-9:
            continue
        lo_u = max(0, int(np.floor(min(u0, u1, u2))))
        hi_u = min(width - 1, int(np.ceil(max(u0, u1, u2))))
        lo_v = max(0, int(np.floor(min(v0, v1, v2))))
        hi_v = min(height - 1, int(np.ceil(max(v0, v1, v2))))
        for pv in range(lo_v, hi_v + 1):
            for pu in range(lo_u, hi_u + 1):
                w0 = (u2 - u1) * (pv - v1) - (v2 - v1) * (pu - u1)
                w1 = (u0 - u2) * (pv - v2) - (v0 - v2) * (pu - u2)
                w2 = (u1 - u0) * (pv - v0) - (v1 - v0) * (pu - u0)
                sa = np.sign(area)
                if w0 * sa < 0 or w1 * sa < 0 or w2 * sa < 0:
                    continue
                l0, l1, l2 = w0 / area, w1 / area, w2 / area
                inv_z = l0 / z0 + l1 / z1 + l2 / z2
                pz = 1.0 / inv_z
                if cam.near < pz < cam.far and pz < zbuf[pv, pu]:
                    zbuf[pv, pu] = pz
                    depth[pv, pu] = pz
    return depth
