"""Reference-scale CAD mesh generators + binary PLY + decimation quality.

The reference operated on BOP models of 10k-200k faces
(/root/reference/scripts/smc_bop_val.jl:45-63 ran lm/tless/itodd); these
tests pin that the synthetic CAD generators produce meshes at that scale,
that the binary PLY writer/parser roundtrip exactly, and that the native QEM
decimator preserves geometry well enough for render-and-compare inference.
"""

import numpy as np
import pytest

from bayesianposeestimation.jl_tpu.utils import bop, mesh_io
from bayesianposeestimation.jl_tpu.utils.decimate import decimate


def _shaft(z):
    r = 0.028 + 0.006 * np.sin(40 * np.pi * z)
    return np.clip(r + np.where(np.abs(z) < 0.02, 0.008, 0.0), 0.008, None)


def _cad_meshes():
    return {
        "displaced": mesh_io.displaced_icosphere(0.05, 6, seed=1),
        "lathe": mesh_io.lathe_mesh(_shaft, -0.06, 0.06),
        "torus": mesh_io.torus_mesh(0.045, 0.016),
    }


def test_cad_generators_reference_scale():
    """50k-200k faces, outward winding (positive signed volume), closed
    2-manifold (every edge shared by exactly two faces)."""
    for name, mesh in _cad_meshes().items():
        assert 50_000 <= mesh.n_faces <= 200_000, (name, mesh.n_faces)
        tri = mesh.vertices[mesh.faces].astype(np.float64)
        svol = np.einsum("fi,fi->f", tri[:, 0],
                         np.cross(tri[:, 1], tri[:, 2])).sum() / 6
        assert svol > 0, (name, svol)
        f = mesh.faces.astype(np.int64)
        edges = np.sort(np.concatenate(
            [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert np.all(counts == 2), (name, "non-manifold edges",
                                     np.unique(counts))


def test_subdivide_mesh_counts_and_surface():
    base = mesh_io.icosphere_mesh(1.0, 2)
    sub = mesh_io.subdivide_mesh(base, 2, project_unit=True)
    assert sub.n_faces == base.n_faces * 16
    r = np.linalg.norm(sub.vertices, axis=1)
    np.testing.assert_allclose(r, 1.0, atol=1e-6)


@pytest.mark.parametrize("binary", [True, False])
def test_save_ply_roundtrip(binary, tmp_path):
    mesh = mesh_io.displaced_icosphere(0.05, 4, seed=2)
    path = tmp_path / "m.ply"
    # BOP convention: millimeters on disk, meters in memory
    mesh_io.save_ply(str(path), mesh_io.Mesh(mesh.vertices * 1000, mesh.faces),
                     binary=binary)
    back = bop.load_ply(path)
    np.testing.assert_allclose(back.vertices, mesh.vertices,
                               atol=1e-6 if binary else 1e-4)
    np.testing.assert_array_equal(back.faces, mesh.faces)


def test_qem_decimation_reference_scale_quality():
    """128k -> 1.8k faces in well under a second, with every original vertex
    within ~4% of the diameter of the decimated surface (vertex-to-vertex
    proxy; the true surface distance is smaller)."""
    import time

    mesh = mesh_io.lathe_mesh(_shaft, -0.06, 0.06)
    assert mesh.n_faces == 128_000
    t0 = time.time()
    dec = decimate(mesh, 1800)
    dt = time.time() - t0
    assert dec.n_faces <= 1800
    assert dec.n_faces > 1500
    assert dt < 10.0, dt  # ~0.5 s typical; generous CI margin
    diam = mesh_io.mesh_diameter(mesh)
    vi = mesh.vertices[:: max(1, mesh.n_vertices // 1500)]
    d2 = ((vi[:, None, :] - dec.vertices[None, :, :]) ** 2).sum(-1)
    dev = np.sqrt(d2.min(1))
    # the shaft's 6 mm thread grooves are sub-render-resolution detail that a
    # 70x decimation flattens by design; anything beyond groove amplitude
    # (~5% of diameter) would be real geometric damage
    assert dev.max() < 0.055 * diam, (dev.max(), diam)
    assert np.median(dev) < 0.02 * diam, (np.median(dev), diam)
