"""vqtpu — TPU-native vector quantization framework (JAX/XLA/Pallas/pjit).

Public API mirrors lucidrains/vector-quantize-pytorch (reference
__init__.py:1-17); quantizers land incrementally — see SURVEY.md §2.
"""

from . import core, kernels, codebook, parallel

from .quantizers.vq import VectorQuantize, LossBreakdown

__all__ = [
    'VectorQuantize',
    'LossBreakdown',
]

from .quantizers import (
    FSQ,
    FSP,
    LFQ,
    LatentQuantize,
    SimVQ,
    RandomProjectionQuantizer,
    BinaryMapper,
)

__all__ += [
    'FSQ', 'FSP', 'LFQ', 'LatentQuantize', 'SimVQ',
    'RandomProjectionQuantizer', 'BinaryMapper',
]
