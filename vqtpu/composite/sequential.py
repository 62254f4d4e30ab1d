"""Sequential glue (component C19).

TPU-native equivalent of the reference utils.Sequential (utils.py:40-65):
a chain of modules containing exactly one quantizer; forward kwargs route to
the quantizer, whose extra outputs (indices, losses) are returned alongside
the chain output.
"""

from __future__ import annotations

from flax import nnx

from ..core.module import ModeModule
from ..quantizers.vq import VectorQuantize
from ..quantizers.fsq import FSQ
from ..quantizers.fsp import FSP
from ..quantizers.lfq import LFQ
from ..quantizers.latent import LatentQuantize
from ..quantizers.sim_vq import SimVQ
from ..quantizers.rpq import RandomProjectionQuantizer
from .residual_vq import ResidualVQ, GroupedResidualVQ
from .residual_fsq import ResidualFSQ, GroupedResidualFSQ
from .residual_lfq import ResidualLFQ, GroupedResidualLFQ
from .residual_sim_vq import ResidualSimVQ
from .hierarchical_vq import HierarchicalVQ

QUANTIZE_KLASSES = (
    VectorQuantize,
    ResidualVQ,
    GroupedResidualVQ,
    RandomProjectionQuantizer,
    FSQ,
    LFQ,
    SimVQ,
    ResidualSimVQ,
    ResidualLFQ,
    GroupedResidualLFQ,
    ResidualFSQ,
    GroupedResidualFSQ,
    FSP,
    LatentQuantize,
    HierarchicalVQ,
)


class Sequential(ModeModule):
    def __init__(self, *fns: nnx.Module):
        assert sum(int(isinstance(fn, QUANTIZE_KLASSES)) for fn in fns) == 1, (
            'this special Sequential must contain exactly one quantizer'
        )
        self.fns = nnx.List(list(fns))

    def __call__(self, x, **kwargs):
        rest = ()
        for fn in self.fns:
            if not isinstance(fn, QUANTIZE_KLASSES):
                x = fn(x)
                continue
            x, *rest = fn(x, **kwargs)
        return (x, *rest)
