"""Import trained reference (lucidrains/vector-quantize-pytorch) checkpoints.

`import_torch_state(module, torch_state)` writes a reference `state_dict()`
(converted to numpy: `{k: v.numpy() for k, v in sd.items()}` — torch itself
is NOT required here) into the equivalent vqtpu module in place. With
identical state, vqtpu produces exactly the reference's indices and
quantized outputs (tests/test_golden_parity.py), so this is a lossless
migration path.

Weight-layout conversions applied:
  - torch nn.Linear weight (out, in)  -> flax kernel (in, out):   transpose
  - torch nn.Conv2d weight (O, I, H, W) -> flax (H, W, I, O):     transpose
  - codebook buffers (embed / embed_avg / cluster_size / initted) copy as-is
    (reference vector_quantize_pytorch.py:415-423)

Supported: VectorQuantize, ResidualVQ, GroupedResidualVQ, SimVQ,
ResidualSimVQ, LatentQuantize, RandomProjectionQuantizer, HierarchicalVQ.
FSQ / FSP / LFQ / BinaryMapper keep their learnables in projections only,
which also route through the generic rules below.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _to_np(v):
    arr = np.asarray(v)
    return arr


def _set(var, value):
    value = jnp.asarray(np.asarray(value))
    assert var[...].shape == value.shape, (
        f'shape mismatch: {var[...].shape} vs {value.shape}'
    )
    var.value = value.astype(var[...].dtype)


def _linear(torch_state, prefix, jlin):
    _set(jlin.kernel, _to_np(torch_state[f'{prefix}.weight']).T)
    if f'{prefix}.bias' in torch_state and getattr(jlin, 'bias', None) is not None:
        _set(jlin.bias, _to_np(torch_state[f'{prefix}.bias']))


def _conv2d(torch_state, prefix, jconv):
    w = _to_np(torch_state[f'{prefix}.weight'])          # (O, I, H, W)
    _set(jconv.kernel, np.transpose(w, (2, 3, 1, 0)))
    if f'{prefix}.bias' in torch_state:
        _set(jconv.bias, _to_np(torch_state[f'{prefix}.bias']))


def _codebook(torch_state, prefix, cb):
    _set(cb.embed, _to_np(torch_state[f'{prefix}.embed']))
    if f'{prefix}.embed_avg' in torch_state:
        _set(cb.embed_avg, _to_np(torch_state[f'{prefix}.embed_avg']))
    if f'{prefix}.cluster_size' in torch_state:
        _set(cb.cluster_size, _to_np(torch_state[f'{prefix}.cluster_size']))
    if f'{prefix}.initted' in torch_state:
        cb.initted.value = jnp.asarray(
            bool(np.asarray(torch_state[f'{prefix}.initted'])))
    for stat in ('batch_mean', 'batch_variance',
                 'codebook_mean', 'codebook_variance'):
        key = f'{prefix}.{stat}'
        if key in torch_state and hasattr(cb, stat):
            _set(getattr(cb, stat), _to_np(torch_state[key]))


def _vq(torch_state, prefix, vq):
    p = (prefix + '.') if prefix else ''
    _codebook(torch_state, f'{p}_codebook', vq._codebook)
    if vq.has_projections:
        # reference project_in may be Linear or Sequential(Linear, LayerNorm)
        if f'{p}project_in.weight' in torch_state:
            _linear(torch_state, f'{p}project_in', vq.project_in_linear)
        elif f'{p}project_in.0.weight' in torch_state:
            _linear(torch_state, f'{p}project_in.0', vq.project_in_linear)
            if f'{p}project_in.1.weight' in torch_state and vq.project_in_norm is not None:
                _set(vq.project_in_norm.scale,
                     _to_np(torch_state[f'{p}project_in.1.weight']))
                _set(vq.project_in_norm.bias,
                     _to_np(torch_state[f'{p}project_in.1.bias']))
        if f'{p}project_out.weight' in torch_state:
            _linear(torch_state, f'{p}project_out', vq.project_out_linear)


def import_torch_state(module, torch_state: dict) -> None:
    """Write a reference state_dict (numpy-valued) into `module` in place."""
    import vqtpu

    name = type(module).__name__

    if isinstance(module, vqtpu.VectorQuantize):
        _vq(torch_state, '', module)

    elif isinstance(module, (vqtpu.GroupedResidualVQ,
                             vqtpu.GroupedResidualLFQ,
                             vqtpu.GroupedResidualFSQ)):
        for g, rvq in enumerate(module.rvqs):
            sub = {k[len(f'rvqs.{g}.'):]: v for k, v in torch_state.items()
                   if k.startswith(f'rvqs.{g}.')}
            import_torch_state(rvq, sub)

    elif isinstance(module, (vqtpu.ResidualVQ, vqtpu.ResidualSimVQ)):
        for i, layer in enumerate(module.layers):
            sub = {k[len(f'layers.{i}.'):]: v for k, v in torch_state.items()
                   if k.startswith(f'layers.{i}.')}
            import_torch_state(layer, sub)
        if f'project_in.weight' in torch_state and getattr(
                module, 'project_in', None) is not None:
            _linear(torch_state, 'project_in', module.project_in)
        if f'project_out.weight' in torch_state and getattr(
                module, 'project_out', None) is not None:
            _linear(torch_state, 'project_out', module.project_out)
        # QINCo MLPs
        if getattr(module, 'mlps', None) is not None:
            for i, mlp in enumerate(module.mlps):
                _linear(torch_state, f'mlps.{i}.proj_in', mlp.proj_in)
                for j, block in enumerate(mlp.layers):
                    _linear(torch_state, f'mlps.{i}.layers.{j}.0', block.lin1)
                    _linear(torch_state, f'mlps.{i}.layers.{j}.2', block.lin2)

    elif isinstance(module, vqtpu.SimVQ):
        _set(module.frozen_codebook, _to_np(torch_state['frozen_codebook']))
        if 'code_transform.weight' in torch_state:
            _linear(torch_state, 'code_transform', module.code_transform)
        else:  # custom Sequential transforms: match Linear leaves in order
            lins = [m for m in (getattr(module.code_transform, 'layers', None)
                                or []) ]
            idx = 0
            for k in sorted(torch_state):
                if k.startswith('code_transform.') and k.endswith('.weight'):
                    _linear(torch_state, k[:-len('.weight')], lins[idx])
                    idx += 1

    elif isinstance(module, vqtpu.LatentQuantize):
        for i in range(len(module.values_per_latent)):
            _set(module.values_per_latent[i],
                 _to_np(torch_state[f'values_per_latent.{i}']))
        if module.project_in is not None and 'project_in.weight' in torch_state:
            _linear(torch_state, 'project_in', module.project_in)
            _linear(torch_state, 'project_out', module.project_out)

    elif isinstance(module, vqtpu.RandomProjectionQuantizer):
        _set(module.rand_projs, _to_np(torch_state['rand_projs']))
        sub = {k[len('vq.'):]: v for k, v in torch_state.items()
               if k.startswith('vq.')}
        import_torch_state(module.vq, sub)

    elif isinstance(module, vqtpu.HierarchicalVQ):
        sub = {k[len('vq.'):]: v for k, v in torch_state.items()
               if k.startswith('vq.')}
        import_torch_state(module.vq, sub)
        # reference stores a single smoother under 'phi_shared' when
        # share_quant_resi == 1; vqtpu always uses the phi_levels list (the
        # shared case is a 1-element list)
        if any(k.startswith('phi_shared.') for k in torch_state):
            _conv2d(torch_state, 'phi_shared.conv', module.phi_levels[0].conv)
        else:
            for i, phi in enumerate(module.phi_levels):
                _conv2d(torch_state, f'phi_levels.{i}.conv', phi.conv)

    elif isinstance(module, (vqtpu.FSQ, vqtpu.FSP, vqtpu.LFQ,
                             vqtpu.BinaryMapper)):
        # stateless cores: only the optional in/out projections are learnable
        # (FSQ finite_scalar_quantization.py: project_in/out; LFQ
        # lookup_free_quantization.py:138-146; BinaryMapper has no params)
        for pname in ('project_in', 'project_out'):
            if f'{pname}.weight' in torch_state:
                target = getattr(module, pname, None)
                if target is None:
                    continue
                if hasattr(target, 'kernel'):
                    _linear(torch_state, pname, target)
                elif hasattr(target, 'weight'):      # LFQ CosineSimLinear
                    _set(target.weight,
                         _to_np(torch_state[f'{pname}.weight']).T)

    elif isinstance(module, (vqtpu.ResidualFSQ, vqtpu.ResidualLFQ)):
        for i, layer in enumerate(module.layers):
            sub = {k[len(f'layers.{i}.'):]: v for k, v in torch_state.items()
                   if k.startswith(f'layers.{i}.')}
            import_torch_state(layer, sub)
        for pname in ('project_in', 'project_out'):
            if (f'{pname}.weight' in torch_state
                    and getattr(module, pname, None) is not None):
                _linear(torch_state, pname, getattr(module, pname))

    else:
        raise NotImplementedError(
            f'import_torch_state: unsupported module {name}')
