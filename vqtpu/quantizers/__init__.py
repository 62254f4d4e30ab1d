from .vq import VectorQuantize, LossBreakdown
from .fsq import FSQ
from .fsp import FSP, VectorNorm, build_cdf_act
from .lfq import LFQ, CosineSimLinear
from .latent import LatentQuantize
from .sim_vq import SimVQ
from .rpq import RandomProjectionQuantizer
from .binary_mapper import BinaryMapper
