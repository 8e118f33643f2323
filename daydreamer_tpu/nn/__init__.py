from .module import (
    Module, Context, pure, context, creating, rng, scan, value_and_grad,
    cast_to_compute, set_compute_dtype, META)
from . import module
from .layers import Linear, Conv2D, Norm, Input, get_act
from .opt import Optimizer
from .utils import (
    AutoAdapt, Normalize, action_noise, balance_stats, video_grid, symlog,
    symexp)
from . import dists
from .dists import (
    OneHotDist, Independent, Normal, MultivariateNormalDiag, TruncNormal,
    Bernoulli, MSEDist, SymlogDist, kl_divergence)
