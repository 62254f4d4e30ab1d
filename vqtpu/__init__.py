"""vqtpu — TPU-native vector quantization framework (JAX/XLA/Pallas/pjit).

Public API mirrors lucidrains/vector-quantize-pytorch (reference
__init__.py:1-17), re-designed TPU-first: flax NNX modules over pure
functional state transitions, fused Pallas kernels for the hot distance /
argmin path, and psum-based collectives over an optional mesh axis for
data-parallel statistics.
"""

from . import core, kernels, codebook, parallel, quantizers, composite, utils

from .quantizers.vq import VectorQuantize, LossBreakdown
from .quantizers.fsq import FSQ
from .quantizers.fsp import FSP
from .quantizers.lfq import LFQ
from .quantizers.latent import LatentQuantize
from .quantizers.sim_vq import SimVQ
from .quantizers.rpq import RandomProjectionQuantizer
from .quantizers.binary_mapper import BinaryMapper

from .composite.residual_vq import ResidualVQ, GroupedResidualVQ
from .composite.residual_fsq import ResidualFSQ, GroupedResidualFSQ
from .composite.residual_lfq import ResidualLFQ, GroupedResidualLFQ
from .composite.residual_sim_vq import ResidualSimVQ
from .composite.hierarchical_vq import HierarchicalVQ
from .composite.sequential import Sequential

from .core.metrics import (
    codebook_perplexity,
    codebook_utilization,
    ema_perplexity,
    ema_utilization,
)

__all__ = [
    'VectorQuantize',
    'LossBreakdown',
    'ResidualVQ',
    'GroupedResidualVQ',
    'RandomProjectionQuantizer',
    'FSQ',
    'FSP',
    'LFQ',
    'ResidualLFQ',
    'GroupedResidualLFQ',
    'ResidualFSQ',
    'GroupedResidualFSQ',
    'LatentQuantize',
    'SimVQ',
    'ResidualSimVQ',
    'BinaryMapper',
    'HierarchicalVQ',
    'Sequential',
    'codebook_perplexity',
    'codebook_utilization',
    'ema_perplexity',
    'ema_utilization',
]
