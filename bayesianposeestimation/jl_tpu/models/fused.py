"""Fused posteriors: the graph-based models compiled onto the Pallas kernel.

Produces drop-in replacements for the ``experiment_models`` factories whose
likelihood evaluates via ``ops.pallas_raster.pallas_render_score`` — render,
association, per-pixel mixture logpdf, and the pixel reduction all inside one
kernel (SURVEY.md §3.5's fusion target). The regularizers apply outside on
the kernel's (ℓ, Σo) outputs:

* ImageLikelihoodNormalizer:  ℓ_reg = c_reg / Σo * ℓ      (Models.jl:47-71)
* SimpleImageRegularization:  ℓ_reg = c_reg / n_pix * ℓ   (Models.jl:81-87)

The object is duck-compatible with ``posterior.PosteriorModel`` (same
``sample_prior`` / ``tempered_logdensity_sample`` / ``bijectors`` /
``quaternion_names`` / ``graph`` surface), so every sampler runs on it
unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..distributions import Normal, QuaternionUniform
from ..graph import BroadcastedNode
from ..models import pixel as P
from ..ops.pallas_raster import (
    antipodal_pair_faces,
    paired_layout_ok,
    pallas_render_score,
    resolve_chunk,
    spatial_sort_faces,
)
from ..posterior import tempered_logdensity
from ..samples import Sample

__all__ = ["FusedPosterior", "fused_posterior", "make_score_fn",
           "make_hyper_score_fn", "make_tuned_chain"]


def make_hyper_score_fn(params, variant: str):
    """Score fn with TRACED likelihood scalars: (mu, z, prior_o, hyper) ->
    (ell_px, o) where ``hyper`` is the kernel's 8-scalar SMEM row with
    hyper[0] = pixel_sigma and hyper[1] = association_sigma. Hyperparameter
    sweeps over these values then share one compiled kernel (the static
    ``params`` values for them are ignored)."""
    def fn(mu, z, prior_o, hyper):
        p2 = params.replace(pixel_sigma=hyper[0], association_sigma=hyper[1])
        return make_score_fn(p2, variant)(mu, z, prior_o)

    return fn


def make_score_fn(params, variant: str):
    """Elementwise (mu, z, prior_o) -> (ell_px, o) for the kernel epilogue.

    Variants mirror the experiment_models factories:
    simple / association / association_simple_reg / smooth /
    smooth_simple_reg / smooth_simple (see ExperimentModels.jl:48-146).
    """
    min_d, max_d = params.min_depth, params.max_depth
    theta, sigma = params.pixel_theta, params.pixel_sigma

    if variant in ("simple", "smooth_simple"):
        # fixed association o = prior (Dirac); both reference variants use
        # pixel_mixture here (ExperimentModels.jl:52-54, 138-146)
        def fn(mu, z, prior_o):
            o = prior_o
            ell = P.pixel_mixture(min_d, max_d, theta, sigma, mu, o).logpdf(z)
            return ell, o

        return fn

    if variant in ("association", "association_simple_reg"):
        o_fn = P.pixel_association_fn(params)

        def fn(mu, z, prior_o):
            o = o_fn(prior_o, mu, z)
            ell = P.pixel_mixture(min_d, max_d, theta, sigma, mu, o).logpdf(z)
            return ell, o

        return fn

    if variant in ("smooth", "smooth_simple_reg"):
        o_fn = P.smooth_association_fn(params)

        def fn(mu, z, prior_o):
            o = o_fn(prior_o, mu, z)
            ell = P.smooth_mixture(min_d, max_d, theta, sigma, mu, o).logpdf(z)
            return ell, o

        return fn

    if variant == "no_exp":
        # :no_exp ablation — no occlusion component, fixed o
        # (smc_observation.jl:60-65)
        def fn(mu, z, prior_o):
            o = prior_o
            ell = P.uniform_pixel_mixture(min_d, max_d, sigma, mu, o).logpdf(z)
            return ell, o

        return fn

    if variant == "no_exp_association":
        o_fn = P.uniform_association_fn(params)

        def fn(mu, z, prior_o):
            o = o_fn(prior_o, mu, z)
            ell = P.uniform_pixel_mixture(min_d, max_d, sigma, mu, o).logpdf(z)
            return ell, o

        return fn

    raise ValueError(variant)


_SIMPLE_REG = ("simple", "association_simple_reg", "smooth_simple_reg",
               "smooth_simple", "no_exp", "no_exp_association")


class FusedPosterior:
    """Duck-typed PosteriorModel whose likelihood is the fused kernel.

    ``prior_graph``: optional dict of BroadcastedNodes for the prior (e.g. the
    particle filter's velocity-state prior, pf_prior_nodes); defaults to the
    point prior {t, r}. The likelihood always consumes (t, r) only."""

    def __init__(self, params, experiment, variant: str = "association",
                 backface_cull: bool = True, prior_graph=None,
                 traced_hyper: bool = False):
        self.params = params
        self.experiment = experiment
        self.variant = variant
        self.backface_cull = backface_cull
        if traced_hyper:
            # tuned likelihood scalars ride an SMEM row into the kernel so a
            # hyperparameter sweep shares ONE compiled program (the fields
            # may hold tracers; see make_tuned_chain)
            self.score_fn = make_hyper_score_fn(params, variant)
            self._hyper = jnp.stack([
                jnp.asarray(params.pixel_sigma, jnp.float32),
                jnp.asarray(params.association_sigma, jnp.float32),
            ])
        else:
            self.score_fn = make_score_fn(params, variant)
            self._hyper = None
        self.simple_reg = variant in _SIMPLE_REG
        # Reorder the mesh ONCE for the kernel. Preferred: antipodal pairing
        # (half-size raster region + silhouette overflow — see
        # ops.pallas_raster.antipodal_pair_faces), available when the mesh is
        # concrete, backface-culled, and small enough that the unrolled
        # A-chunk + overflow regions fit the kernel's region cap (the A
        # region itself is chunked, so multi-chunk resolutions like 50x50
        # qualify). Fallback: chunk-aligned spatial sort so the per-(chunk,
        # band) liveness culling can skip dead raster regions. Doing it here
        # (not per render call) keeps the work out of the sampler's scanned
        # step.
        scene = experiment.scene
        n_pix = params.width * params.height
        concrete = not (isinstance(scene["faces"], jax.core.Tracer)
                        or isinstance(scene["verts"], jax.core.Tracer))
        self._paired = bool(
            backface_cull and concrete
            and paired_layout_ok(scene["faces"].shape[0], n_pix,
                                 params.raster_chunk))
        if self._paired:
            self._sorted_faces = antipodal_pair_faces(
                scene["verts"], scene["faces"])
        else:
            self._sorted_faces = spatial_sort_faces(
                scene["verts"], scene["faces"],
                resolve_chunk(scene["faces"].shape[0], n_pix,
                              params.raster_chunk))

        if prior_graph is None:
            # point prior without the μ node — the render lives inside the
            # likelihood kernel
            t_node = BroadcastedNode("t", Normal, jnp.asarray(experiment.prior_t),
                                     jnp.asarray(params.sigma_t))
            r_node = BroadcastedNode("r", QuaternionUniform)
            prior_graph = {"t": t_node, "r": r_node}
        from ..graph import bijectors_of, quaternion_names_of

        self.graph = prior_graph
        self.prior = prior_graph
        self.prior_stochastic = prior_graph
        self.likelihood = {}
        self.bijectors = bijectors_of(prior_graph)
        self.quaternion_names = quaternion_names_of(prior_graph)

    # -- PosteriorModel protocol -------------------------------------------
    def sample_prior(self, key, n_particles: int) -> Sample:
        from ..graph import sample_graph

        values = sample_graph(self.graph, key, (n_particles,))
        return Sample(values)

    def prior_and_likelihood(self, sample: Sample, batch_ndim: int = 1):
        t = sample.variables["t"]
        r = sample.variables["r"]
        batch = t.shape[:-1]
        exp = self.experiment
        params = self.params
        ell_raw, sum_o = pallas_render_score(
            exp.scene["verts"], self._sorted_faces, exp.scene["camera"],
            t.reshape(-1, 3), r.reshape(-1, 4),
            exp.depth_image, jnp.asarray(exp.prior_o, params.float_type),
            self.score_fn, height=params.height, width=params.width,
            chunk=params.raster_chunk, backface_cull=self.backface_cull,
            paired=self._paired, hyper=self._hyper,
        )
        ell_raw = ell_raw.reshape(batch)
        sum_o = sum_o.reshape(batch)
        if self.simple_reg:
            ell_like = P.simple_image_regularization(
                params.c_reg, ell_raw, params.width * params.height)
        else:
            ell_like = P.logdensity_npixel(ell_raw, params.c_reg, sum_o)

        # prior logdensity via the prior graph (identity bijectors: these
        # variables are unconstrained / on the quaternion manifold)
        from ..graph import logdensityof_graph

        lp = logdensityof_graph(self.graph, sample.variables, len(batch))
        return lp, ell_like

    def logdensity_sample(self, sample: Sample, batch_ndim: int = 1) -> Sample:
        lp, ll = self.prior_and_likelihood(sample, batch_ndim)
        return sample.set_logdensities(lp + ll, ll)

    def tempered_logdensity_sample(self, sample: Sample, temp, batch_ndim: int = 1) -> Sample:
        lp, ll = self.prior_and_likelihood(sample, batch_ndim)
        return sample.set_logdensities(tempered_logdensity(lp, ll, temp), ll)


def fused_posterior(params, experiment, variant: str = "association",
                    backface_cull: bool = True, prior_graph=None) -> FusedPosterior:
    """Factory mirroring the experiment_models constructors but fused:
    ``variant`` selects association/mixture/regularizer wiring."""
    return FusedPosterior(params, experiment, variant, backface_cull, prior_graph)


def make_conditioned_chain(params, verts, faces, variant, sampler_factory,
                           n_steps, collect_vars=("t", "r"), n_chains=None):
    """Compile-once chain runner conditioned on per-image data.

    Returns ``run(key, camera, depth_img, prior_o, prior_t) -> (outs, final)``
    jitted ONCE per (mesh shape, resolution, sampler, n_steps): the crop
    camera (pytree of traced intrinsics), observation, segmentation prior, and
    position prior are all traced arguments, so a BOP sweep pays exactly one
    compile per object resolution instead of one per image (the reference
    rebuilds its model per frame too, but interpreted Julia has no retrace
    cost to dodge — XLA does).
    """
    import jax

    from ..parameters import Experiment
    from ..samplers.chain import collect_variables
    from ..samplers.smc import SmcState

    verts = jnp.asarray(verts)
    faces = jnp.asarray(faces)

    @jax.jit
    def _run(key, camera, depth_img, prior_o, prior_t):
        scene = {"camera": camera, "verts": verts, "faces": faces}
        exp = Experiment(scene=scene, prior_o=prior_o, prior_t=prior_t,
                         depth_image=depth_img)
        posterior = FusedPosterior(params, exp, variant)
        sampler = sampler_factory(params, posterior)
        k_init, k_scan = jax.random.split(key)
        _, state0 = sampler.init(k_init, posterior,
                                 params.n_particles if n_chains is None else n_chains)

        def body(state, k):
            sample, new_state = sampler.step(k, posterior, state)
            out = collect_variables(
                new_state if isinstance(new_state, SmcState) else sample, collect_vars)
            return new_state, out

        keys = jax.random.split(k_scan, n_steps - 1)
        final, outs = jax.lax.scan(body, state0, keys)
        return outs, final

    import dataclasses

    def run(key, camera, depth_img, prior_o, prior_t):
        # canonicalize dtypes/weak-types so equivalent inputs never retrace
        camera = dataclasses.replace(
            camera,
            f_x=jnp.float32(camera.f_x), f_y=jnp.float32(camera.f_y),
            c_x=jnp.float32(camera.c_x), c_y=jnp.float32(camera.c_y),
            s=jnp.float32(camera.s),
        )
        return _run(key, camera, jnp.asarray(depth_img, jnp.float32),
                    jnp.asarray(prior_o, jnp.float32),
                    jnp.asarray(prior_t, jnp.float32))

    run._cache_size = _run._cache_size
    return run


def make_tuned_chain(params, verts, faces, variant, sampler_factory,
                     n_steps, collect_vars=("t", "r"), n_chains=None):
    """Chain runner with TRACED tuned hyperparameters: like
    make_conditioned_chain, but the returned
    ``run(key, camera, depth_img, prior_o, prior_t, hyper) -> (outs, final)``
    additionally takes ``hyper`` = dict(pixel_sigma=s, association_sigma=s,
    sigma_t=[3], proposal_sigma_r=[3]) as traced values, so a hyperparameter
    search runs EVERY candidate through one compiled program (step time — and
    therefore the budget-calibrated step count — is candidate-independent).

    The likelihood scalars reach the Pallas kernel via an SMEM hyper row
    (FusedPosterior(traced_hyper=True)); the prior/proposal sigmas flow
    through the graph nodes as ordinary traced arrays.

    Parity: this powers the BCAPSampler-style search of
    /root/reference/scripts/smc_mh_hyperopt.jl at reference trial counts —
    the Julia reference pays no per-candidate compile, and with this neither
    do we.
    """
    import jax

    from ..parameters import Experiment
    from ..samplers.chain import collect_variables
    from ..samplers.smc import SmcState

    verts = jnp.asarray(verts)
    faces = jnp.asarray(faces)

    @jax.jit
    def _run(key, camera, depth_img, prior_o, prior_t, hyper):
        params2 = params.replace(
            pixel_sigma=hyper["pixel_sigma"],
            association_sigma=hyper["association_sigma"],
            sigma_t=hyper["sigma_t"],
            proposal_sigma_r=hyper["proposal_sigma_r"],
        )
        scene = {"camera": camera, "verts": verts, "faces": faces}
        exp = Experiment(scene=scene, prior_o=prior_o, prior_t=prior_t,
                         depth_image=depth_img)
        posterior = FusedPosterior(params2, exp, variant, traced_hyper=True)
        sampler = sampler_factory(params2, posterior)
        k_init, k_scan = jax.random.split(key)
        _, state0 = sampler.init(k_init, posterior,
                                 params.n_particles if n_chains is None else n_chains)

        def body(state, k):
            sample, new_state = sampler.step(k, posterior, state)
            out = collect_variables(
                new_state if isinstance(new_state, SmcState) else sample, collect_vars)
            return new_state, out

        keys = jax.random.split(k_scan, n_steps - 1)
        final, outs = jax.lax.scan(body, state0, keys)
        return outs, final

    import dataclasses

    def run(key, camera, depth_img, prior_o, prior_t, hyper):
        camera = dataclasses.replace(
            camera,
            f_x=jnp.float32(camera.f_x), f_y=jnp.float32(camera.f_y),
            c_x=jnp.float32(camera.c_x), c_y=jnp.float32(camera.c_y),
            s=jnp.float32(camera.s),
        )
        hyper = {
            "pixel_sigma": jnp.float32(hyper["pixel_sigma"]),
            "association_sigma": jnp.float32(hyper["association_sigma"]),
            "sigma_t": jnp.asarray(hyper["sigma_t"], jnp.float32),
            "proposal_sigma_r": jnp.asarray(hyper["proposal_sigma_r"],
                                            jnp.float32),
        }
        return _run(key, camera, jnp.asarray(depth_img, jnp.float32),
                    jnp.asarray(prior_o, jnp.float32),
                    jnp.asarray(prior_t, jnp.float32), hyper)

    run._cache_size = _run._cache_size
    return run
