"""Infrastructure tests: artifacts caching, function manipulation, sharded
multi-chip chain, conditioned compile-once runner."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayesianposeestimation.jl_tpu.function_manipulation import pipeable
from bayesianposeestimation.jl_tpu.utils.artifacts import (
    collect_results,
    dict_list,
    parse_savename,
    produce_or_load,
    savename,
)


def test_dict_list_cartesian():
    configs = dict_list({"a": [1, 2], "b": "x", "c": [True, False]})
    assert len(configs) == 4
    assert {"a": 1, "b": "x", "c": True} in configs


def test_savename_roundtrip():
    config = {"sampler": "smc_mh", "scene_id": 3, "budget": 0.5}
    name = savename(config)
    assert name == "budget=0.5,sampler=smc_mh,scene_id=3"
    parsed = parse_savename(name + ".npz")
    assert parsed == {"budget": 0.5, "sampler": "smc_mh", "scene_id": 3}


def test_produce_or_load_caches(tmp_path):
    calls = []

    def fn(config):
        calls.append(config)
        return {"value": np.asarray([config["x"] * 2])}

    out1, path = produce_or_load(fn, {"x": 3}, tmp_path)
    out2, _ = produce_or_load(fn, {"x": 3}, tmp_path)
    assert len(calls) == 1  # second call served from disk
    assert out2["value"][0] == 6
    results = collect_results(tmp_path)
    assert len(results) == 1
    assert results[0]["__config__"] == {"x": 3}


def test_produce_or_load_signature_staleness(tmp_path):
    """A cached artifact whose effective-parameter signature differs (or is
    missing) from the requested one must be recomputed, not replayed —
    otherwise a re-tune between rounds silently mixes operating points in
    one aggregate CSV (ADVICE r4 medium)."""
    calls = []

    def fn(config):
        calls.append(config)
        return {"value": np.asarray([len(calls)])}

    sig_a = {"n_particles": 100, "sigma_t": (0.01, 0.01, 0.01)}
    out1, _ = produce_or_load(fn, {"x": 1}, tmp_path, signature=sig_a)
    # same signature (fresh dict, tuple vs list) -> cache hit
    out2, _ = produce_or_load(fn, {"x": 1}, tmp_path,
                              signature={"n_particles": 100,
                                         "sigma_t": [0.01, 0.01, 0.01]})
    assert len(calls) == 1 and out2["value"][0] == 1
    # changed signature -> stale, recompute
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        out3, _ = produce_or_load(fn, {"x": 1}, tmp_path,
                                  signature={**sig_a, "n_particles": 10})
    assert len(calls) == 2 and out3["value"][0] == 2
    # legacy artifact without a signature -> also stale when one is required
    out4, _ = produce_or_load(fn, {"x": 2}, tmp_path)  # writes unsigned
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        out5, _ = produce_or_load(fn, {"x": 2}, tmp_path, signature=sig_a)
    assert len(calls) == 4
    # unsigned callers never invalidate a signed artifact
    out6, _ = produce_or_load(fn, {"x": 1}, tmp_path)
    assert len(calls) == 4


def test_pipeable_partial_application():
    def f(a, b, c):
        return (a, b, c)

    g = pipeable(f) | (1, 2)
    assert g(3) == (1, 2, 3)
    h = pipeable(f) | 1 | 2
    assert h(3) == (1, 2, 3)
    # hashable (usable as static jit arg)
    assert hash(g) == hash(pipeable(f) | (1, 2))


def test_sharded_chain_matches_structure(key):
    """Particle-sharded SMC over the 8-device CPU mesh: finite evidence,
    correct shapes (the dryrun_multichip path, in-suite)."""
    from bayesianposeestimation.jl_tpu.distributions import Normal
    from bayesianposeestimation.jl_tpu.graph import BroadcastedNode, sequentialize
    from bayesianposeestimation.jl_tpu.parallel.sharded import (
        particle_mesh,
        sharded_sample_chain,
    )
    from bayesianposeestimation.jl_tpu.posterior import PosteriorModel
    from bayesianposeestimation.jl_tpu.proposals import symmetric_proposal
    from bayesianposeestimation.jl_tpu.samplers import MhKernel, SequentialMonteCarlo
    from bayesianposeestimation.jl_tpu.tempering import LinearSchedule

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    x = BroadcastedNode("x", Normal, 0.0, 1.0)
    y = BroadcastedNode("y", Normal, x, 0.5) | jnp.float32(1.0)
    model = PosteriorModel(y)
    q = symmetric_proposal(sequentialize(BroadcastedNode("x", Normal, 0.0, 0.3)), model)
    smc = SequentialMonteCarlo(MhKernel(q), LinearSchedule(10), 64, np.log(0.5))
    mesh = particle_mesh(8)
    outs, final = sharded_sample_chain(key, model, smc, n_steps=5, n_particles=64,
                                       mesh=mesh, collect_vars=("x",))
    assert outs["x"].shape == (4, 64)
    assert np.isfinite(np.asarray(outs["log_evidence"])).all()


def test_conditioned_chain_no_recompile(key):
    """make_conditioned_chain runs with different cameras/images without
    retracing (one compile per mesh/resolution)."""
    from bayesianposeestimation.jl_tpu.camera import CvCamera
    from bayesianposeestimation.jl_tpu.models import experiment_samplers as es
    from bayesianposeestimation.jl_tpu.models.fused import make_conditioned_chain
    from bayesianposeestimation.jl_tpu.parameters import Parameters
    from bayesianposeestimation.jl_tpu.utils.mesh_io import cube_mesh

    params = Parameters(width=16, height=16, n_particles=16, n_steps=3,
                        raster_chunk=64)
    mesh = cube_mesh(0.1)
    run = make_conditioned_chain(params, mesh.vertices, mesh.faces,
                                 "association", es.smc_mh, 3)
    cam1 = CvCamera(width=16, height=16, f_x=20.0, f_y=20.0, c_x=7.5, c_y=7.5)
    cam2 = CvCamera(width=16, height=16, f_x=25.0, f_y=24.0, c_x=8.1, c_y=7.2)
    z = jnp.full((16, 16), jnp.inf)
    o = jnp.full((16, 16), 0.7)
    t0 = jnp.array([0.0, 0.0, 1.0])
    outs1, _ = run(key, cam1, z, o, t0)
    outs2, _ = run(key, cam2, jnp.ones((16, 16)), o, t0 + 0.01)
    assert outs1["t"].shape == (2, 16, 3)
    assert np.isfinite(np.asarray(outs2["log_prob"])).all()
    # cameras are traced: one cache entry despite different intrinsics
    assert run._cache_size() == 1


@pytest.mark.parametrize("sampler_name", ["smc_mh", "mh_sampler"])
def test_tuned_chain_matches_conditioned(key, sampler_name):
    """make_tuned_chain with hyper == the params values must reproduce
    make_conditioned_chain exactly (same keys, same math — the traced
    hyperparameters only change HOW the scalars reach the kernel), and
    different candidates must share one compiled program."""
    from bayesianposeestimation.jl_tpu.camera import CvCamera
    from bayesianposeestimation.jl_tpu.models import experiment_samplers as es
    from bayesianposeestimation.jl_tpu.models.fused import (
        make_conditioned_chain,
        make_tuned_chain,
    )
    from bayesianposeestimation.jl_tpu.parameters import Parameters
    from bayesianposeestimation.jl_tpu.utils.mesh_io import cube_mesh

    params = Parameters(width=16, height=16, n_particles=16, n_steps=4,
                        raster_chunk=64, pixel_sigma=0.004,
                        association_sigma=0.004, sigma_t=(0.02, 0.02, 0.02),
                        proposal_sigma_r=(0.5, 0.5, 0.5))
    mesh = cube_mesh(0.1)
    factory = getattr(es, sampler_name)
    n_chains = None if sampler_name == "smc_mh" else 1
    ref = make_conditioned_chain(params, mesh.vertices, mesh.faces,
                                 "association", factory, 4, n_chains=n_chains)
    tuned = make_tuned_chain(params, mesh.vertices, mesh.faces,
                             "association", factory, 4, n_chains=n_chains)
    cam = CvCamera(width=16, height=16, f_x=20.0, f_y=20.0, c_x=7.5, c_y=7.5)
    z = jnp.ones((16, 16))
    o = jnp.full((16, 16), 0.7)
    t0 = jnp.array([0.0, 0.0, 1.0])
    hyper = dict(pixel_sigma=params.pixel_sigma,
                 association_sigma=params.association_sigma,
                 sigma_t=params.sigma_t,
                 proposal_sigma_r=params.proposal_sigma_r)
    outs_ref, _ = ref(key, cam, z, o, t0)
    outs_tuned, _ = tuned(key, cam, z, o, t0, hyper)
    for k in ("t", "r", "log_like"):
        np.testing.assert_allclose(np.asarray(outs_ref[k]),
                                   np.asarray(outs_tuned[k]), rtol=1e-6,
                                   atol=1e-6)
    # a different candidate reuses the compiled program and changes results
    hyper2 = dict(hyper, pixel_sigma=0.012, association_sigma=0.012,
                  sigma_t=(0.04, 0.04, 0.04),
                  proposal_sigma_r=(1.5, 1.5, 1.5))
    outs2, _ = tuned(key, cam, z, o, t0, hyper2)
    assert tuned._cache_size() == 1
    assert not np.allclose(np.asarray(outs2["log_like"]),
                           np.asarray(outs_tuned["log_like"]))
