"""Pallas fused kernel vs XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianposeestimation.jl_tpu import quaternions as quat
from bayesianposeestimation.jl_tpu.camera import CvCamera, crop_camera
from bayesianposeestimation.jl_tpu.models import pixel as P
from bayesianposeestimation.jl_tpu.models.fused import make_score_fn
from bayesianposeestimation.jl_tpu.ops.pallas_raster import (
    pallas_render_depth,
    pallas_render_score,
)
from bayesianposeestimation.jl_tpu.ops.rasterize import render_depth_batch
from bayesianposeestimation.jl_tpu.parameters import Parameters
from bayesianposeestimation.jl_tpu.utils.mesh_io import cube_mesh, icosphere_mesh

CAM = CvCamera(width=16, height=16, f_x=16.0, f_y=16.0, c_x=7.5, c_y=7.5, near=0.01, far=10.0)


def _poses(key, n):
    q = quat.rand_quaternion(key, (n,))
    t = jnp.array([0.0, 0.0, 1.0]) + 0.03 * jax.random.normal(key, (n, 3))
    return t, q


@pytest.mark.parametrize("mesh_fn", [cube_mesh, icosphere_mesh])
def test_pallas_render_matches_xla(mesh_fn, key):
    mesh = mesh_fn(0.1) if mesh_fn is cube_mesh else mesh_fn(0.06, 1)
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    t, q = _poses(key, 5)
    a = np.asarray(render_depth_batch(verts, faces, CAM, t, q, chunk=64))
    b = np.asarray(pallas_render_depth(verts, faces, CAM, t, q, chunk=64))
    assert np.mean((a > 0) != (b > 0)) < 0.01
    both = (a > 0) & (b > 0)
    np.testing.assert_allclose(a[both], b[both], atol=2e-3)


def test_backface_cull_is_exact(key):
    mesh = icosphere_mesh(0.06, 1)
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    t, q = _poses(key, 3)
    a = np.asarray(pallas_render_depth(verts, faces, CAM, t, q, backface_cull=True))
    b = np.asarray(pallas_render_depth(verts, faces, CAM, t, q, backface_cull=False))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fused_score_matches_composition(key):
    """Fused kernel (ℓ, Σo) == render -> associate -> logpdf -> reduce in XLA."""
    params = Parameters(width=16, height=16)
    mesh = cube_mesh(0.1)
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    t, q = _poses(key, 6)
    k_obs = jax.random.PRNGKey(7)
    clean = render_depth_batch(verts, faces, CAM, t[:1], q[:1])[0]
    z = jnp.where(clean > 0, clean + 0.01 * jax.random.normal(k_obs, clean.shape), jnp.inf)
    prior_o = jnp.float32(0.7)

    score_fn = make_score_fn(params, "association")
    ell, sumo = pallas_render_score(verts, faces, CAM, t, q, z, prior_o, score_fn, chunk=64)

    # reference composition in plain XLA
    mu = render_depth_batch(verts, faces, CAM, t, q)
    o_fn = P.pixel_association_fn(params)
    o = o_fn(prior_o, mu, z)
    lp = P.pixel_mixture(params.min_depth, params.max_depth, params.pixel_theta,
                         params.pixel_sigma, mu, o).logpdf(z)
    ell_ref = jnp.sum(lp, axis=(-2, -1))
    sumo_ref = jnp.sum(o, axis=(-2, -1))
    np.testing.assert_allclose(ell, ell_ref, rtol=1e-3, atol=0.2)
    np.testing.assert_allclose(sumo, sumo_ref, rtol=1e-3, atol=0.2)


def test_fused_posterior_matches_graph(key):
    """FusedPosterior densities == graph-based association_posterior."""
    from bayesianposeestimation.jl_tpu.models import experiment_models as em
    from bayesianposeestimation.jl_tpu.models.fused import fused_posterior
    from bayesianposeestimation.jl_tpu.parameters import Experiment

    params = Parameters(width=16, height=16, raster_chunk=64)
    mesh = cube_mesh(0.1)
    cam = crop_camera(
        CvCamera(width=64, height=64, f_x=64.0, f_y=64.0, c_x=31.5, c_y=31.5,
                 near=0.01, far=10.0),
        np.array([0.0, 0.0, 1.0]), 0.1 * np.sqrt(3), width=16, height=16)
    scene = {"camera": cam, "verts": jnp.asarray(mesh.vertices),
             "faces": jnp.asarray(mesh.faces)}
    gt_t = jnp.array([0.0, 0.0, 1.0])
    clean = render_depth_batch(scene["verts"], scene["faces"], cam, gt_t[None],
                               quat.quat_identity()[None])[0]
    exp = Experiment(scene=scene, prior_o=0.7, prior_t=gt_t,
                     depth_image=jnp.where(clean > 0, clean, 0.0))
    graph_post = em.association_posterior(params, exp, em.point_prior(params, exp))
    fused_post = fused_posterior(params, exp, "association")
    s = graph_post.sample_prior(key, 8)
    g = graph_post.logdensity_sample(s)
    f = fused_post.logdensity_sample(s)
    np.testing.assert_allclose(np.asarray(g.log_like), np.asarray(f.log_like),
                               rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(np.asarray(g.log_prob), np.asarray(f.log_prob),
                               rtol=1e-3, atol=0.05)


@pytest.mark.parametrize("variant", ["simple", "smooth", "no_exp",
                                     "no_exp_association"])
def test_fused_variants_run(variant, key):
    params = Parameters(width=16, height=16)
    mesh = cube_mesh(0.1)
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    t, q = _poses(key, 3)
    z = jnp.full((16, 16), jnp.inf)
    score_fn = make_score_fn(params, variant)
    ell, sumo = pallas_render_score(verts, faces, CAM, t, q, z, 0.7, score_fn, chunk=64)
    assert ell.shape == (3,)
    assert bool(jnp.all(jnp.isfinite(ell)))


def test_non_square_render_matches_xla(key):
    """width != height exercises the flat-index row/col math (idx % width)
    that every square test leaves untested — the PF runs at 80x60."""
    cam = CvCamera(width=24, height=10, f_x=20.0, f_y=20.0, c_x=11.5, c_y=4.5,
                   near=0.01, far=10.0)
    mesh = icosphere_mesh(0.06, 1)
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    t, q = _poses(key, 4)
    a = np.asarray(render_depth_batch(verts, faces, cam, t, q, chunk=64))
    for band_cull in (False, True):
        b = np.asarray(pallas_render_depth(verts, faces, cam, t, q, chunk=64,
                                           band_cull=band_cull))
        assert np.mean((a > 0) != (b > 0)) < 0.01
        both = (a > 0) & (b > 0)
        np.testing.assert_allclose(a[both], b[both], atol=2e-3)


def test_band_cull_matches_dense(key):
    """band_cull=True (per-(pose, chunk, band) liveness) must render exactly
    the same depth maps as the dense phased path."""
    mesh = icosphere_mesh(0.06, 2)
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    t, q = _poses(key, 9)  # crosses one POSE_BLOCK boundary
    a = np.asarray(pallas_render_depth(verts, faces, CAM, t, q, chunk=128,
                                       band_cull=False))
    b = np.asarray(pallas_render_depth(verts, faces, CAM, t, q, chunk=128,
                                       band_cull=True))
    np.testing.assert_allclose(a, b, atol=1e-6)


def _assert_renders_match(a, b):
    """Compaction is a pure permutation of per-triangle work under an
    order-invariant max, so per-(triangle, pixel) math is identical — but the
    raster dot has a different M extent (cap vs 2*chunk), and XLA CPU emits
    a different K=6 reduction order for different shapes, so interpret-mode
    results can differ by ~1 ulp (and an edge pixel could in principle flip).
    Assert near-bitwise: <0.1% differing pixels, all within float noise.

    Tolerance: the 1/depth value is DERIVED from the edge dots
    (d = gamma + alpha*W0 + beta*W1, see ops/pallas_raster.py), so an
    edge-dot reduction-order ulp — amplified by the cancellation factor of
    slivery triangles' edge forms — lands in the depth as a few 1e-5
    relative (~10 um); rtol reflects that, not bitwise equality."""
    a, b = np.asarray(a), np.asarray(b)
    assert np.mean((a > 0) != (b > 0)) < 1e-3
    both = (a > 0) & (b > 0)
    np.testing.assert_allclose(a[both], b[both], rtol=5e-5)


def test_compact_matches_dense(key):
    """Triangle compaction (one-hot MXU permutation + region skipping) must
    reproduce the dense path for multi-region meshes, single-region tiny
    meshes, behind-camera pose padding, and the fused score path."""
    from bayesianposeestimation.jl_tpu.models.fused import make_score_fn

    mesh = icosphere_mesh(0.06, 3)  # 1280 faces -> cap 640, 2 regions
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    t, q = _poses(key, 9)  # 9 poses: one padded POSE_BLOCK row
    a = pallas_render_depth(verts, faces, CAM, t, q, compact=False)
    b = pallas_render_depth(verts, faces, CAM, t, q, compact=True)
    _assert_renders_match(a, b)
    assert float((np.asarray(a) > 0).mean()) > 0.005  # non-trivial coverage

    cube = cube_mesh(0.1)  # 12 faces -> single always-run region
    ca = pallas_render_depth(jnp.asarray(cube.vertices), jnp.asarray(cube.faces),
                             CAM, t, q, compact=False)
    cb = pallas_render_depth(jnp.asarray(cube.vertices), jnp.asarray(cube.faces),
                             CAM, t, q, compact=True)
    _assert_renders_match(ca, cb)

    params = Parameters(width=16, height=16)
    z = jnp.where(a[0] > 0, a[0], jnp.inf)
    fn = make_score_fn(params, "association")
    ell0, so0 = pallas_render_score(verts, faces, CAM, t, q, z, 0.7, fn,
                                    compact=False)
    ell1, so1 = pallas_render_score(verts, faces, CAM, t, q, z, 0.7, fn,
                                    compact=True)
    np.testing.assert_allclose(np.asarray(ell0), np.asarray(ell1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(so0), np.asarray(so1), rtol=1e-4)

    # conflicting opt-ins must fail loudly, not silently fall back to dense
    with pytest.raises(ValueError):
        pallas_render_depth(verts, faces, CAM, t, q, compact=True,
                            band_cull=True)


def test_paired_matches_dense(key):
    """The paired path (antipodal pair selection + silhouette overflow) must
    reproduce the dense path on closed meshes, open meshes (worst-case
    pairing: every live pair may overflow), odd face counts, and the fused
    score path; and FusedPosterior must auto-enable it for concrete meshes.
    Reference behavior: SciGL's full rasterization — pairing is a pure
    per-pose repartition of the triangle set under an order-invariant max."""
    from bayesianposeestimation.jl_tpu.ops.pallas_raster import (
        antipodal_pair_faces, paired_layout_ok)

    mesh = icosphere_mesh(0.06, 3)  # 1280 faces -> f_half 640, 5 overflows
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    t, q = _poses(key, 9)  # one padded POSE_BLOCK row
    fp = antipodal_pair_faces(verts, faces)
    assert fp.shape[0] % 256 == 0
    a = pallas_render_depth(verts, faces, CAM, t, q)
    b = pallas_render_depth(verts, fp, CAM, t, q, paired=True)
    _assert_renders_match(a, b)
    assert float((np.asarray(a) > 0).mean()) > 0.005

    # open mesh (no closed-surface antipodes) + odd face count: every pair
    # can be both-live -> pure-overflow worst case must stay correct
    v2 = jnp.array([[-0.05, -0.05, 0.0], [0.05, -0.05, 0.0],
                    [0.05, 0.05, 0.0], [-0.05, 0.05, 0.0],
                    [0.0, 0.0, 0.02]], jnp.float32)
    f2 = jnp.array([[0, 1, 4], [1, 2, 4], [2, 3, 4]], jnp.int32)  # odd
    a2 = pallas_render_depth(v2, f2, CAM, t, q)
    b2 = pallas_render_depth(v2, antipodal_pair_faces(v2, f2), CAM, t, q,
                             paired=True)
    _assert_renders_match(a2, b2)

    # multi-chunk region A: an explicit chunk dividing the half (640 = 5*128)
    # exercises the chunked select/raster with per-A-chunk liveness gating —
    # the layout the auto-choice picks at 50x50, where VMEM caps the chunk
    b3 = pallas_render_depth(verts, fp, CAM, t, q, paired=True, chunk=128)
    _assert_renders_match(a, b3)

    # fused score path
    params = Parameters(width=16, height=16)
    z = jnp.where(a[0] > 0, a[0], jnp.inf)
    fn = make_score_fn(params, "association")
    ell0, so0 = pallas_render_score(verts, faces, CAM, t, q, z, 0.7, fn)
    ell1, so1 = pallas_render_score(verts, fp, CAM, t, q, z, 0.7, fn,
                                    paired=True)
    np.testing.assert_allclose(np.asarray(ell0), np.asarray(ell1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(so0), np.asarray(so1), rtol=1e-4)
    ell2, so2 = pallas_render_score(verts, fp, CAM, t, q, z, 0.7, fn,
                                    paired=True, chunk=128)
    np.testing.assert_allclose(np.asarray(ell0), np.asarray(ell2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(so0), np.asarray(so2), rtol=1e-4)

    # layout gate: flagship + 50px-scale sizes fit (multi-chunk A region);
    # only region-cap overflow (huge meshes) falls back; explicit dividing
    # chunks are accepted by the gate; un-paired (lane-unaligned) face
    # arrays, non-dividing chunks, and over-cap meshes are rejected
    assert paired_layout_ok(1280, 900)
    assert paired_layout_ok(1280, 2500)
    assert paired_layout_ok(5000, 2500)
    assert paired_layout_ok(1280, 2500, chunk=128)
    assert not paired_layout_ok(1280, 2500, chunk=192)
    assert not paired_layout_ok(40000, 2500)
    with pytest.raises(ValueError):
        pallas_render_depth(v2, f2, CAM, t, q, paired=True)
    with pytest.raises(ValueError):
        pallas_render_depth(verts, fp, CAM, t, q, paired=True, chunk=192)
    with pytest.raises(ValueError):  # over the unrolled-region cap
        big = jnp.zeros((3, 3), jnp.float32)
        pallas_render_depth(big, jnp.zeros((40960, 3), jnp.int32), CAM, t, q,
                            paired=True)

    # empty mesh: the pairing preprocessing must produce the degenerate
    # padded layout, not crash on the empty fancy index
    fe = antipodal_pair_faces(jnp.zeros((0, 3), jnp.float32),
                              jnp.zeros((0, 3), jnp.int32))
    assert fe.shape[0] % 256 == 0 and int(jnp.sum(fe)) == 0


def test_spatial_sort_is_permutation(key):
    """Bisection reordering must keep the face set identical (only order may
    change) and tighten per-chunk centroid extents (chunks are bisection
    leaves; a shell patch of 1/n_chunks of the surface area bounds how tight
    they can get, so assert a modest but real improvement)."""
    from bayesianposeestimation.jl_tpu.ops.pallas_raster import spatial_sort_faces

    mesh = icosphere_mesh(0.06, 3)
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    chunk = 128
    sorted_faces = np.asarray(spatial_sort_faces(verts, faces, chunk))
    a = {tuple(r) for r in np.asarray(faces)}
    b = {tuple(r) for r in sorted_faces}
    assert a == b

    def mean_extent(fc):
        cent = np.asarray(verts)[fc].mean(axis=1)
        f_pad = len(cent) // chunk * chunk
        ch = cent[:f_pad].reshape(-1, chunk, 3)
        return float((ch.max(axis=1) - ch.min(axis=1)).sum(axis=-1).mean())

    assert mean_extent(sorted_faces) < 0.85 * mean_extent(np.asarray(faces))


def test_band_slices_cover_and_cap():
    from bayesianposeestimation.jl_tpu.ops.pallas_raster import (
        _MAX_REGIONS,
        _band_slices,
    )

    for p_pad, n_chunks in [(1024, 5), (1024, 1), (4864, 5), (16384, 10),
                            (128, 64)]:
        bands = _band_slices(p_pad, n_chunks)
        assert bands[0][0] == 0 and bands[-1][1] == p_pad
        for (s0, e0), (s1, e1) in zip(bands, bands[1:]):
            assert e0 == s1
        assert all((e - s) % 128 == 0 for s, e in bands)
        assert n_chunks * len(bands) <= max(_MAX_REGIONS, n_chunks)


def test_auto_chunk_minimizes_padding():
    """The chunk choice must minimize total padded rows: 1280 faces must not
    pad to 2048 (the round-1 auto-chunk wasted 60% dot work there)."""
    from bayesianposeestimation.jl_tpu.ops.pallas_raster import (
        _auto_chunk,
        _round_up,
    )

    # bench config: 1280 faces, 900 px -> p_pad 1024
    c = _auto_chunk(1280, 1024)
    assert _round_up(1280, c) == 1280, (c, _round_up(1280, c))
    # PF config: 320 faces, 4800 px -> p_pad 4864
    c = _auto_chunk(320, 4864)
    assert _round_up(320, c) == 384  # best possible with 128-multiples
    # chunk stays within the VMEM budget for large pixel counts (the dot
    # group count follows the depth_in_dot policy: 3 at small p_pad, 2 past
    # the crossover)
    from bayesianposeestimation.jl_tpu.ops.pallas_raster import (
        _CHUNK_VMEM_BUDGET,
        _resolve_depth_in_dot,
    )

    for f, p in [(5000, 1024), (1280, 65536), (100, 128)]:
        c = _auto_chunk(f, p)
        n_dot = 3 if _resolve_depth_in_dot(None, p) else 2
        assert c % 128 == 0
        assert n_dot * c * p * 4 <= max(_CHUNK_VMEM_BUDGET,
                                        n_dot * 128 * p * 4)


def test_kernel_resolution_bound():
    """Renders beyond the bf16-exact grid bound must be rejected."""
    import pytest as _pytest

    from bayesianposeestimation.jl_tpu.camera import CvCamera
    from bayesianposeestimation.jl_tpu.ops.pallas_raster import pallas_render_depth
    from bayesianposeestimation.jl_tpu.utils.mesh_io import cube_mesh

    mesh = cube_mesh(0.1)
    cam = CvCamera(width=512, height=512, f_x=600.0, f_y=600.0,
                   c_x=255.5, c_y=255.5)
    t = jnp.array([[0.0, 0.0, 1.0]])
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    with _pytest.raises(ValueError, match="256px"):
        pallas_render_depth(jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
                            cam, t, q)


def test_depth_layout_parity(key):
    """The two 1/depth layouts — riding the dot as a third M-row group
    (depth_in_dot, the small-crop policy) vs epilogue reconstruction
    d = gamma + alpha*W0 + beta*W1 (the large-crop policy) — must agree on
    every raster path. Their arithmetic differs (bf16x2 dot of d_a/d_b/d_c
    coefficients vs f32 scalars against the edge dots), so parity is to
    float noise, not bitwise. Reference behavior: SciGL renders one depth
    map regardless of internals (/root/reference/src/RenderContext.jl:42-49)."""
    from bayesianposeestimation.jl_tpu.ops.pallas_raster import (
        _resolve_depth_in_dot, antipodal_pair_faces)

    # auto policy: in-dot up to 1024 padded pixels (30x30 flagship), 2-group
    # reconstruction past it (50x50 = 2560 lanes)
    assert _resolve_depth_in_dot(None, 1024)
    assert not _resolve_depth_in_dot(None, 2560)

    mesh = icosphere_mesh(0.06, 2)
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    t, q = _poses(key, 5)

    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        assert np.mean((a > 0) != (b > 0)) < 1e-3
        both = (a > 0) & (b > 0)
        np.testing.assert_allclose(a[both], b[both], rtol=2e-4)

    a = pallas_render_depth(verts, faces, CAM, t, q, depth_in_dot=True)
    assert float((np.asarray(a) > 0).mean()) > 0.005
    # dense
    close(a, pallas_render_depth(verts, faces, CAM, t, q, depth_in_dot=False))
    # band-culled
    close(a, pallas_render_depth(verts, faces, CAM, t, q, band_cull=True,
                                 depth_in_dot=False))
    # compacted
    close(a, pallas_render_depth(verts, faces, CAM, t, q, compact=True,
                                 depth_in_dot=False))
    # paired (incl. multi-chunk region A)
    fp = antipodal_pair_faces(verts, faces)
    close(a, pallas_render_depth(verts, fp, CAM, t, q, paired=True,
                                 depth_in_dot=False))
    close(a, pallas_render_depth(verts, fp, CAM, t, q, paired=True, chunk=128,
                                 depth_in_dot=False))

    # fused score path agrees across layouts
    params = Parameters(width=16, height=16)
    z = jnp.where(a[0] > 0, a[0], jnp.inf)
    fn = make_score_fn(params, "association")
    ell0, so0 = pallas_render_score(verts, faces, CAM, t, q, z, 0.7, fn,
                                    depth_in_dot=True)
    ell1, so1 = pallas_render_score(verts, faces, CAM, t, q, z, 0.7, fn,
                                    depth_in_dot=False)
    np.testing.assert_allclose(np.asarray(ell0), np.asarray(ell1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(so0), np.asarray(so1), rtol=1e-4)
