from . import utils, ste, sampling, layout, metrics
from .utils import exists, default, l2norm, safe_div, entropy, cdist, cdist_sq, lens_to_mask, masked_mean
from .ste import straight_through, rotate_to, directional_reparam, round_ste, floor_ste, frac_gradient
from .sampling import gumbel_sample, sample_vectors, batched_sample_vectors, masked_sample_vectors
from .layout import to_tokens, TokenLayout
from .metrics import (
    index_histogram,
    codebook_perplexity,
    codebook_utilization,
    ema_perplexity,
    ema_utilization,
    perplexity_from_histogram,
)
