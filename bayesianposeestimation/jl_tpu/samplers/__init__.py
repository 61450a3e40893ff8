from .chain import collect_variables, sample_chain, smc_inference
from .composed import ComposedSampler, CoordinateSampler
from .gibbs import Gibbs
from .mh import MCMCState, MetropolisHastings, acceptance_ratio, mh_kernel
from .mtm import MultipleTry, gumbel_index
from .smc import (
    AdaptiveKernel,
    BootstrapKernel,
    ForwardProposalKernel,
    MhKernel,
    SequentialMonteCarlo,
    SmcState,
    log_relative_ess,
    logevidence,
    normalize_log_weights,
    resample_systematic,
    systematic_resampling_indices,
)
