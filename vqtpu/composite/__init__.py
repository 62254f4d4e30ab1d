from .residual_vq import ResidualVQ, GroupedResidualVQ, MLP
from .residual_fsq import ResidualFSQ, GroupedResidualFSQ
from .residual_lfq import ResidualLFQ, GroupedResidualLFQ
from .residual_sim_vq import ResidualSimVQ
from .hierarchical_vq import HierarchicalVQ
from .sequential import Sequential, QUANTIZE_KLASSES
