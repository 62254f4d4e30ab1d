from . import collectives
from .collectives import psum, pmean, all_gather, axis_size
from .sharded_vq import (
    ShardedCodebookState,
    init_sharded_codebook,
    sharded_quantize,
    sharded_ema_update,
)
from .shard import (
    make_mesh,
    DataParallelTrainer,
    sharded_nearest_code,
    sharded_gather_codes,
    sharded_quantize_lookup_bf16,
    local_onehot_from_global,
)
from .tp import (
    codebook_pspecs,
    find_sharded_codebooks,
    TensorParallelTrainer,
    tp_apply,
)
from .group import (
    group_parallel_forward,
    group_parallel_output_from_indices,
)
from .multihost import init_multihost, is_multiprocess, global_batch
