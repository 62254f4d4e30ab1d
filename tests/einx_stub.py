"""Minimal einx stub so the torch reference (/root/reference) imports in this
zero-egress environment for golden-parity tests.

Implements exactly the call patterns the reference uses (grep: 4x einx.where,
1x einx.add, einx.get_at only in comments):
  - where('..., ... k, -> ... k', mask, t, scalar)            vq.py:1315
  - where('b n, b n ... d, b n d -> b n ... d', mask, q, mv)  vq.py:1384
  - where('b n, b n ..., -> b n ...', mask, ind, scalar)      vq.py:1391
  - where('..., ... l,', mask, losses, scalar)                residual_vq.py:579
  - add('... j, ... j k -> ... (j k)', scores, delta)         residual_vq.py:515

Install with: sys.modules.setdefault('einx', importlib.import_module(
    'tests.einx_stub'))  # before importing the reference
"""

import torch


def _broadcast_mask(mask, target_ndim):
    while mask.dim() < target_ndim:
        mask = mask.unsqueeze(-1)
    return mask


def where(pattern, mask, a, b):
    if not torch.is_tensor(a):
        a = torch.tensor(a)
    target = a.dim()
    if torch.is_tensor(b) and b.dim() > target:
        target = b.dim()
    m = _broadcast_mask(mask.bool(), target)
    if torch.is_tensor(b) and b.dim() < target:
        # 'b n, b n ... d, b n d -> b n ... d': right-align trailing d, pad
        # middle dims of b with singleton axes after the mask dims
        while b.dim() < target:
            b = b.unsqueeze(2) if b.dim() >= 2 else b.unsqueeze(-1)
    if not torch.is_tensor(b):
        b = torch.tensor(b, dtype=a.dtype, device=a.device)
    return torch.where(m, a, b)


def add(pattern, a, b):
    assert pattern.replace(' ', '') in (
        '...j,...jk->...(jk)',
    ), pattern
    out = a.unsqueeze(-1) + b
    return out.reshape(*out.shape[:-2], -1)


def get_at(pattern, source, idx):
    p = pattern.replace(' ', '')
    if p == 'q[c]d,bnq->qbnd':
        # residual_vq.py get_codes_from_indices: per-quantizer codebook row
        # gather; idx has been masked_fill'd to 0 for dropout slots already
        q = source.shape[0]
        idxq = idx.permute(2, 0, 1).long()          # (q, b, n)
        return source[torch.arange(q)[:, None, None], idxq]
    if p.startswith('[c]d,b'):
        # sim_vq.py:92 '[c] d, b ... -> b ... d': plain row gather
        return source[idx.long()]
    if p == 'bn[c]d,bn->bnd':
        # residual_vq.py QINCo decode: per-token transformed-codebook gather
        g = idx.long()[..., None, None].expand(*idx.shape, 1, source.shape[-1])
        return source.gather(-2, g).squeeze(-2)
    raise NotImplementedError(pattern)
