from . import collectives
from .collectives import psum, pmean, all_gather, axis_size
from .sharded_vq import (
    ShardedCodebookState,
    init_sharded_codebook,
    sharded_quantize,
    sharded_ema_update,
)
from .shard import make_mesh, DataParallelTrainer, sharded_nearest_code
