from .checkpoint import (
    state_dict,
    load_state_dict,
    save_checkpoint,
    restore_checkpoint,
    DERIVED_STATE_DOC,
)
from .profiling import trace, annotate, timeit_chained
from .torch_import import import_torch_state
