"""Parameters monolith + Experiment container.

Parity targets: /root/reference/src/Parameters.jl — the ~30-field ``Parameters``
@kwdef struct (:103-145) with float-type casting (:148-230) and seeded RNG
derivation (:155-206); ``Experiment`` (:18-48) with invalid-depth→∞
preprocessing and device transfer.

TPU-native notes: ``Parameters`` is a frozen dataclass (hashable → usable as a
static jit argument); RNG plumbing becomes a single ``jax.random.PRNGKey``
seed. The reference's ``device``/``array_type`` switch maps to JAX platforms
(tests pin CPU via JAX_PLATFORMS; production runs on TPU) — arrays are
device-agnostic here. Field names use ASCII transliterations of the Julia
unicode (σ->sigma, θ->theta).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["Parameters", "Experiment"]


@dataclass(frozen=True)
class Parameters:
    """Inference configuration (defaults mirror Parameters.jl:103-145)."""

    # Render context
    width: int = 30
    height: int = 30
    depth: int = 100  # number of parallel renderings = particle batch per draw
    min_depth: float = 0.5
    max_depth: float = 1.5

    # Depth pixel model
    pixel_sigma: float = 0.01
    pixel_theta: float = 1.0
    # Pixel association
    association_sigma: float = 0.01
    proposal_sigma_o: float = 0.01
    # Image model
    c_reg: float = 50.0

    # Pose model
    sigma_t: tuple = (0.03, 0.03, 0.03)
    # Association model
    o_mask_is: float = 0.7
    o_mask_not: float = 0.3
    # Proposal model
    proposal_sigma_t: tuple = (0.01, 0.01, 0.01)
    proposal_sigma_r: tuple = (0.1, 0.1, 0.1)
    velocity_decay: float = 0.9

    # Inference
    float_type: Any = jnp.float32
    device: str = "tpu"
    seed: int = 8418387917544508114
    n_steps: int = 3_000
    time_budget: float = 0.5
    n_burn_in: int = 0
    n_thinning: int = 0
    n_particles: int = 100
    relative_ess: float = 0.5
    w_r_ind: float = 0.1
    w_t_ind: float = 0.1
    w_r_sym: float = 0.9
    w_t_sym: float = 0.9

    # Renderer tuning (TPU-specific)
    raster_chunk: int | None = None  # None -> VMEM-budget auto-chunk

    # -- derived ------------------------------------------------------------
    @property
    def img_size(self):
        return (self.width, self.height)

    def key(self):
        """Seeded PRNG key (replaces host_rng/cuda_rng/device_rng of the
        reference — one key covers both 'devices')."""
        return jax.random.PRNGKey(self.seed % (2**63))

    def replace(self, **kw) -> "Parameters":
        """Immutable update (the reference uses Accessors.@reset)."""
        return dataclasses.replace(self, **kw)

    def cast(self, x):
        """Cast to the configured float type (parity: the getproperty Val
        dispatch auto-casting of Parameters.jl:148-230)."""
        return jnp.asarray(x, self.float_type)


@dataclass(frozen=True)
class Experiment:
    """Per-scene data: camera/scene, priors, observed depth image.

    Parity: Experiment at Parameters.jl:18-48. Preprocessing: invalid depth
    (<= 0) is replaced by +inf so only the TailUniform long tail carries
    density there (see /root/reference/src/Models.jl:18).

    ``scene``: dict with 'camera' (CvCamera), 'verts' [V,3], 'faces' [F,3]
    (replaces the SciGL Scene + GL context pair; there is no context to
    manage — rendering is a pure function).
    """

    scene: dict
    prior_o: Any  # scalar or [H, W] segmentation-mask probabilities
    prior_t: Any  # [3]
    prior_r: Any = None  # [4] quaternion, identity if None
    depth_image: Any = None  # [H, W]

    def __post_init__(self):
        if self.prior_r is None:
            object.__setattr__(self, "prior_r", jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32))
        if self.depth_image is not None:
            img = jnp.asarray(self.depth_image)
            img = jnp.where(img <= 0, jnp.inf, img)
            object.__setattr__(self, "depth_image", img)
        if self.prior_t is not None:
            object.__setattr__(self, "prior_t", jnp.asarray(self.prior_t))

    def with_depth_image(self, depth_image) -> "Experiment":
        """New experiment with a replaced observation (streaming filters)."""
        return Experiment(self.scene, self.prior_o, self.prior_t, self.prior_r, depth_image)

    @property
    def camera(self):
        return self.scene["camera"]
