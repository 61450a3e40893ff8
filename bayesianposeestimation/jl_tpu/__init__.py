"""TPU-native Bayesian 6-DoF pose estimation (rebuild of rwth-irt/BayesianPoseEstimation.jl).

Public API mirrors the reference's constructor names (SURVEY.md §7): the
distribution zoo, pixel likelihood models, posterior/sampler factories, and
the fused render+score path. Import as::

    import bayesianposeestimation.jl_tpu as bpe
"""

from . import bijectors, camera, common, distributions, quaternions
from .bijectors import IDENTITY, LOG, LOGIT
from .camera import CvCamera, crop_camera, depth_to_distance, reproject_3d
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

__version__ = "0.1.0"
