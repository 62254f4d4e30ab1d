"""Regenerate docs/API.md from source: python docs/gen_api.py > docs/API.md"""
import inspect
import re
import sys

import jax

jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, '/root/repo')

import vqtpu
from vqtpu import utils as vutils
from vqtpu.core import metrics
from vqtpu.kernels import distance
from vqtpu.kernels import lfq_entropy
from vqtpu.parallel import collectives, group, multihost, shard, sharded_vq, tp

print('# vqtpu API reference\n')
print('Generated from source (`python docs/gen_api.py > docs/API.md`). One')
print('entry per public symbol: signature and summary.\n')


def describe(obj):
    doc = inspect.getdoc(obj) or ''
    if doc.startswith('Base class for all neural network'):  # inherited nnx doc
        doc = ''
    if not doc and inspect.isclass(obj):
        mod = sys.modules.get(obj.__module__)
        doc = inspect.getdoc(mod) or ''
    return doc.split('\n\n')[0].replace('\n', ' ')


def emit(title, objs):
    print(f'## {title}\n')
    for name, obj in objs:
        if inspect.isclass(obj):
            try:
                sig = str(inspect.signature(obj.__init__)).replace('self, ', '')
            except (TypeError, ValueError):
                sig = '(...)'
            kind = 'class'
        else:
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = '(...)'
            kind = 'def'
        print(f'### `{name}`\n')
        sig = re.sub(r' at 0x[0-9a-f]+', ' at 0x...', str(sig))
        print(f'```python\n{kind} {name}{sig}\n```\n')
        doc = describe(obj)
        if doc:
            print(doc + '\n')


quantizers = [(n, getattr(vqtpu, n)) for n in vqtpu.__all__
              if inspect.isclass(getattr(vqtpu, n, None))
              and n != 'LossBreakdown']
emit('Quantizers and composites', quantizers)
emit('Metrics', [(n, getattr(metrics, n)) for n in (
    'codebook_perplexity', 'codebook_utilization', 'ema_perplexity',
    'ema_utilization', 'index_histogram')])
emit('Checkpointing / migration / profiling (vqtpu.utils)',
     [(n, getattr(vutils, n)) for n in (
         'state_dict', 'load_state_dict', 'save_checkpoint',
         'restore_checkpoint', 'import_torch_state', 'timeit_chained',
         'trace', 'annotate')])
emit('Distributed (vqtpu.parallel)', [
    ('make_mesh', shard.make_mesh),
    ('DataParallelTrainer', shard.DataParallelTrainer),
    ('TensorParallelTrainer', tp.TensorParallelTrainer),
    ('codebook_pspecs', tp.codebook_pspecs),
    ('tp_apply', tp.tp_apply),
    ('init_multihost', multihost.init_multihost),
    ('global_batch', multihost.global_batch),
    ('sharded_nearest_code', shard.sharded_nearest_code),
    ('sharded_gather_codes', shard.sharded_gather_codes),
    ('sharded_quantize', sharded_vq.sharded_quantize),
    ('sharded_ema_update', sharded_vq.sharded_ema_update),
    ('init_sharded_codebook', sharded_vq.init_sharded_codebook),
    ('psum', collectives.psum),
    ('all_gather', collectives.all_gather),
    ('group_parallel_forward', group.group_parallel_forward),
    ('group_parallel_output_from_indices',
     group.group_parallel_output_from_indices),
])
emit('Kernels (vqtpu.kernels)', [
    ('nearest_code', distance.nearest_code),
    ('nearest_code_xla', distance.nearest_code_xla),
    ('gather_codes', distance.gather_codes),
    ('quantize_lookup', distance.quantize_lookup),
    ('lfq_entropy_stats_fused', lfq_entropy.lfq_entropy_stats_fused),
])
