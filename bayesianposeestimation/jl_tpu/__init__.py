"""TPU-native Bayesian 6-DoF pose estimation (rebuild of rwth-irt/BayesianPoseEstimation.jl).

Public API mirrors the reference's constructor names (SURVEY.md §7): the
distribution zoo, pixel likelihood models, posterior/sampler factories, and
the fused render+score path. Import as::

    import bayesianposeestimation.jl_tpu as bpe
"""

from . import (
    bijectors,
    camera,
    common,
    distributions,
    function_manipulation,
    graph,
    posterior,
    proposals,
    quaternions,
    render,
    samples,
    samplers,
    tempering,
)
from .bijectors import IDENTITY, LOG, LOGIT
from .camera import CvCamera, crop_camera, crop_image, depth_to_distance, reproject_3d
from .common import (
    add_logdensity,
    map_intersect,
    norm_dims,
    normalize_dims,
    pose_matrix,
    quat_dist,
    sum_and_dropdims,
    to_cpu,
    to_pose_matrix,
)
from .distributions import (
    BinaryMixture,
    Dirac,
    Exponential,
    Gumbel,
    MvNormal,
    Normal,
    QuaternionNormal,
    QuaternionUniform,
    SmoothExponential,
    TailUniform,
    TruncatedExponential,
    Uniform,
)
from .function_manipulation import ManipulatedFunction, pipeable
from .graph import (
    BroadcastedNode,
    DeterministicNode,
    ModifierNode,
    sequentialize,
)
from .models import experiment_models, experiment_samplers, particle_filter, pixel
from .models.experiment_models import (
    association_posterior,
    association_simple_reg,
    point_from_segmentation,
    point_prior,
    simple_posterior,
    smooth_posterior,
    smooth_simple_posterior,
    smooth_simple_reg,
)
from .models.experiment_samplers import (
    mh_local_sampler,
    mh_sampler,
    mtm_local_sampler,
    mtm_sampler,
    smc_bootstrap,
    smc_forward,
    smc_mh,
)
from .models.fused import FusedPosterior, fused_posterior, make_conditioned_chain
from .models.particle_filter import (
    Dynamics,
    JointDynamics,
    bootstrap_pf,
    coordinate_pf,
    fused_pf_posterior,
    pf_prior,
    pf_prior_nodes,
)
from .models.pixel import (
    image_likelihood_normalizer,
    marginalized_association,
    pixel_association_fn,
    pixel_mixture,
    pixel_tail,
    simple_image_regularization,
    smooth_association_fn,
    smooth_mixture,
    smooth_tail,
    truncated_association_fn,
    truncated_mixture,
    truncated_tail,
)
from .ops.pallas_raster import (
    pallas_render_depth,
    pallas_render_score,
    resolve_chunk,
    spatial_sort_faces,
)
from .ops.rasterize import render_depth, render_depth_batch
from .parameters import Experiment, Parameters
from .posterior import PosteriorModel, retemper, tempered_logdensity
from .proposals import (
    Proposal,
    additive_proposal,
    independent_proposal,
    propose,
    symmetric_proposal,
    transition_probability,
)
from .quaternions import (
    qconj,
    qexp,
    qlog,
    qminus,
    qmul,
    qnormalize,
    qplus,
    qrotate,
    quat_identity,
    quat_to_matrix,
    rand_quaternion,
)
from .render import RenderContext, render, render_context, render_crop_fn, render_fn
from .samples import Sample, sample_minus, sample_plus, to_model_domain, to_unconstrained_domain
from .samplers import (
    AdaptiveKernel,
    BootstrapKernel,
    ComposedSampler,
    CoordinateSampler,
    ForwardProposalKernel,
    Gibbs,
    MCMCState,
    MetropolisHastings,
    MhKernel,
    MultipleTry,
    SequentialMonteCarlo,
    SmcState,
    collect_variables,
    logevidence,
    sample_chain,
    smc_inference,
)
from .tempering import ConstantSchedule, ExponentialSchedule, LinearSchedule

__version__ = "0.1.0"
