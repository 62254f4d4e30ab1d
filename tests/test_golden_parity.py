"""Golden numerical-parity tests against the torch reference.

The reference implementation (/root/reference, read-only) runs on CPU torch
in this image; einx is stubbed (tests/einx_stub.py). Each test injects
IDENTICAL weights into both frameworks, feeds identical inputs, and compares
outputs / post-step EMA state. This is the strongest form of the
"MSE + perplexity within 1%" parity bar (BASELINE.md): bit-level agreement
of the quantization math itself.

Covers: VQ eval + train-EMA step, cosine-sim, multi-head, masking,
rotation-trick gradients, FSQ codes/indices, LFQ quantize/entropy,
ResidualVQ forward + decode.
"""

import importlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip('torch')

sys.modules.setdefault('einx', importlib.import_module('tests.einx_stub'))
if '/root/reference' not in sys.path:
    sys.path.insert(0, '/root/reference')

ref = pytest.importorskip('vector_quantize_pytorch')

import vqtpu


def t2n(t):
    # always copy: on CPU torch .numpy() is a VIEW of the tensor's storage
    # and jnp.asarray may be zero-copy, so the reference's in-place EMA
    # updates would silently mutate our injected state
    return np.array(t.detach().cpu().numpy())


def make_pair(dim=16, codebook_size=32, seed=0, **kwargs):
    """Construct reference + vqtpu VectorQuantize with identical codebooks."""
    torch.manual_seed(seed)
    rkw = dict(kwargs)
    okw = dict(kwargs)
    rvq = ref.VectorQuantize(dim=dim, codebook_size=codebook_size, **rkw)
    ovq = vqtpu.VectorQuantize(
        dim=dim, codebook_size=codebook_size, rngs=nnx.Rngs(seed), **okw
    )
    # copy reference state -> ours
    embed = t2n(rvq._codebook.embed)
    ovq._codebook.embed.value = jnp.asarray(embed)
    ovq._codebook.embed_avg.value = jnp.asarray(t2n(rvq._codebook.embed_avg))
    ovq._codebook.cluster_size.value = jnp.asarray(t2n(rvq._codebook.cluster_size))
    return rvq, ovq


def assert_close(a, b, atol=1e-5, rtol=1e-5, what=''):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=what)


# ---------------------------------------------------------------------------
# VectorQuantize
# ---------------------------------------------------------------------------

def test_vq_eval_forward_parity():
    rvq, ovq = make_pair()
    rvq.eval()
    ovq.eval()
    x = np.random.default_rng(0).standard_normal((2, 24, 16)).astype(np.float32)
    rq, ri, rl = rvq(torch.from_numpy(x))
    oq, oi, ol = ovq(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, what='eval quantized')


def test_vq_train_step_ema_state_parity():
    rvq, ovq = make_pair(decay=0.8)
    x = np.random.default_rng(1).standard_normal((2, 24, 16)).astype(np.float32)
    rq, ri, rl = rvq(torch.from_numpy(x))
    oq, oi, ol = ovq(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, what='train quantized')
    assert_close(float(rl), float(ol), atol=1e-6, what='commit loss')
    # post-step EMA state must match: decay, laplace smoothing, normalization
    assert_close(
        t2n(rvq._codebook.cluster_size),
        ovq._codebook.cluster_size.value, what='cluster_size',
    )
    assert_close(
        t2n(rvq._codebook.embed_avg),
        ovq._codebook.embed_avg.value, what='embed_avg',
    )
    assert_close(
        t2n(rvq._codebook.embed),
        ovq._codebook.embed.value, what='embed post-EMA',
    )


def test_vq_multi_step_training_trajectory_parity():
    rvq, ovq = make_pair(decay=0.9)
    rng = np.random.default_rng(2)
    for step in range(5):
        x = rng.standard_normal((4, 16, 16)).astype(np.float32)
        rq, ri, rl = rvq(torch.from_numpy(x))
        oq, oi, ol = ovq(jnp.asarray(x))
    assert_close(
        t2n(rvq._codebook.embed),
        ovq._codebook.embed.value, atol=1e-4, what='embed after 5 steps',
    )


@pytest.mark.parametrize('heads,separate', [(4, False), (4, True)])
def test_vq_multihead_parity(heads, separate):
    rvq, ovq = make_pair(
        dim=32, codebook_size=24, heads=heads,
        separate_codebook_per_head=separate, codebook_dim=8,
    )
    # heads*codebook_dim == dim here, so neither side has a projection
    assert not ovq.has_projections
    rvq.eval()
    ovq.eval()
    x = np.random.default_rng(3).standard_normal((2, 10, 32)).astype(np.float32)
    rq, ri, rl = rvq(torch.from_numpy(x))
    oq, oi, ol = ovq(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, what='multihead quantized')


def test_vq_cosine_sim_parity():
    rvq, ovq = make_pair(use_cosine_sim=True)
    rvq.eval()
    ovq.eval()
    x = np.random.default_rng(4).standard_normal((2, 20, 16)).astype(np.float32)
    rq, ri, rl = rvq(torch.from_numpy(x))
    oq, oi, ol = ovq(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, what='cosine quantized')


def test_vq_masked_forward_parity():
    rvq, ovq = make_pair()
    rvq.eval()
    ovq.eval()
    x = np.random.default_rng(5).standard_normal((2, 12, 16)).astype(np.float32)
    mask = np.zeros((2, 12), bool)
    mask[0, :7] = True
    mask[1, :] = True
    rq, ri, rl = rvq(torch.from_numpy(x), mask=torch.from_numpy(mask))
    oq, oi, ol = ovq(jnp.asarray(x), mask=jnp.asarray(mask))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, what='masked quantized')


@pytest.mark.parametrize('estimator', ['rotation', 'ste'])
def test_vq_gradient_estimator_parity(estimator):
    kwargs = (
        dict(rotation_trick=True)
        if estimator == 'rotation'
        else dict(rotation_trick=False, straight_through=False)
    )
    rvq, ovq = make_pair(**kwargs)
    x = np.random.default_rng(6).standard_normal((2, 8, 16)).astype(np.float32)

    # freeze_codebook=True on both sides: train-mode gradient estimators stay
    # active but no EMA state mutation (which jax.grad tracing forbids)
    xt = torch.from_numpy(x).requires_grad_(True)
    rq, ri, rl = rvq(xt, freeze_codebook=True)
    (rq.square().sum() + rl).backward()
    ref_grad = t2n(xt.grad)

    def loss_fn(xj):
        oq, oi, ol = ovq(xj, freeze_codebook=True)
        return (oq ** 2).sum() + ol

    our_grad = jax.grad(loss_fn)(jnp.asarray(x))
    assert_close(ref_grad, our_grad, atol=1e-4, what=f'{estimator} grad')


# ---------------------------------------------------------------------------
# FSQ / LFQ (stateless: no weight copying needed)
# ---------------------------------------------------------------------------

def test_fsq_parity():
    levels = [8, 5, 5, 3]
    rfsq = ref.FSQ(levels=levels)
    ofsq = vqtpu.FSQ(levels=levels, rngs=nnx.Rngs(0))
    rfsq.eval()
    ofsq.eval()
    x = np.random.default_rng(8).standard_normal((2, 10, 4)).astype(np.float32)
    rq, ri = rfsq(torch.from_numpy(x))
    oq, oi = ofsq(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-6, what='fsq codes')
    # index codec parity
    assert_close(
        t2n(rfsq.indices_to_codes(ri)),
        ofsq.indices_to_codes(oi), atol=1e-6, what='fsq decode',
    )


def test_lfq_parity():
    rlfq = ref.LFQ(codebook_size=2 ** 8, dim=8, entropy_loss_weight=0.1,
                   diversity_gamma=1.0)
    olfq = vqtpu.LFQ(codebook_size=2 ** 8, dim=8, entropy_loss_weight=0.1,
                     diversity_gamma=1.0, rngs=nnx.Rngs(0))
    x = np.random.default_rng(9).standard_normal((2, 10, 8)).astype(np.float32)
    rq, ri, rent = rlfq(torch.from_numpy(x))
    oq, oi, oent = olfq(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-6, what='lfq quantized')
    assert_close(float(rent), float(oent), atol=1e-5, what='lfq entropy loss')


# ---------------------------------------------------------------------------
# ResidualVQ
# ---------------------------------------------------------------------------

def test_residual_vq_parity():
    torch.manual_seed(10)
    rrvq = ref.ResidualVQ(dim=16, num_quantizers=4, codebook_size=32)
    orvq = vqtpu.ResidualVQ(dim=16, num_quantizers=4, codebook_size=32,
                            rngs=nnx.Rngs(0))
    for i, layer in enumerate(rrvq.layers):
        ovq = orvq.layers[i]
        ovq._codebook.embed.value = jnp.asarray(t2n(layer._codebook.embed))
        ovq._codebook.embed_avg.value = jnp.asarray(
            t2n(layer._codebook.embed_avg))
        ovq._codebook.cluster_size.value = jnp.asarray(
            t2n(layer._codebook.cluster_size))
    rrvq.eval()
    orvq.eval()
    x = np.random.default_rng(11).standard_normal((2, 12, 16)).astype(np.float32)
    rq, ri, rl = rrvq(torch.from_numpy(x))
    oq, oi, ol = orvq(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-5, what='rvq quantized')
    # decode parity
    rdec = rrvq.get_output_from_indices(ri)
    odec = orvq.get_output_from_indices(oi)
    assert_close(t2n(rdec), odec, atol=1e-5, what='rvq decode')


# ---------------------------------------------------------------------------
# SimVQ / LatentQuantize / RandomProjectionQuantizer / FSP / BinaryMapper
# ---------------------------------------------------------------------------

def test_simvq_parity():
    torch.manual_seed(20)
    rsim = ref.SimVQ(dim=16, codebook_size=32, rotation_trick=True)
    osim = vqtpu.SimVQ(dim=16, codebook_size=32, rotation_trick=True,
                       rngs=nnx.Rngs(0))
    osim.frozen_codebook.value = jnp.asarray(t2n(rsim.frozen_codebook))
    # reference code_transform: Linear(dim, dim, bias=False)
    osim.code_transform.kernel.value = jnp.asarray(
        t2n(rsim.code_transform.weight).T)
    rsim.eval()
    osim.eval()
    x = np.random.default_rng(21).standard_normal((2, 12, 16)).astype(np.float32)
    rq, ri, rl = rsim(torch.from_numpy(x))
    oq, oi, ol = osim(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-5, what='simvq quantized')
    # training losses parity
    rsim.train()
    osim.train()
    xt = torch.from_numpy(x).requires_grad_(True)
    rq, ri, rl = rsim(xt)
    oq, oi, ol = osim(jnp.asarray(x))
    assert_close(float(rl), float(ol), atol=1e-5, what='simvq commit loss')


def test_latent_quantize_parity():
    torch.manual_seed(22)
    levels = [5, 5, 8]
    rlq = ref.LatentQuantize(levels=levels, dim=9, commitment_loss_weight=0.1,
                             quantization_loss_weight=0.1)
    olq = vqtpu.LatentQuantize(levels=levels, dim=9,
                               commitment_loss_weight=0.1,
                               quantization_loss_weight=0.1,
                               rngs=nnx.Rngs(0))
    # copy learnable per-dim values and projections
    for i, p in enumerate(rlq.values_per_latent):
        olq.values_per_latent[i].value = jnp.asarray(t2n(p))
    if hasattr(rlq.project_in, 'weight'):
        olq.project_in.kernel.value = jnp.asarray(t2n(rlq.project_in.weight).T)
        olq.project_in.bias.value = jnp.asarray(t2n(rlq.project_in.bias))
        olq.project_out.kernel.value = jnp.asarray(
            t2n(rlq.project_out.weight).T)
        olq.project_out.bias.value = jnp.asarray(t2n(rlq.project_out.bias))
    rlq.eval()
    olq.eval()
    x = np.random.default_rng(23).standard_normal((2, 9, 10)).astype(np.float32)
    rq, ri, rl = rlq(torch.from_numpy(x))
    oq, oi, ol = olq(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-5, what='latent quantized')


def test_rpq_parity():
    torch.manual_seed(24)
    rr = ref.RandomProjectionQuantizer(dim=16, codebook_size=32,
                                       codebook_dim=8, num_codebooks=2)
    oo = vqtpu.RandomProjectionQuantizer(dim=16, codebook_size=32,
                                         codebook_dim=8, num_codebooks=2,
                                         rngs=nnx.Rngs(0))
    oo.rand_projs.value = jnp.asarray(t2n(rr.rand_projs))
    oo.vq._codebook.embed.value = jnp.asarray(t2n(rr.vq._codebook.embed))
    # the inner VQ projects dim (16) -> heads*codebook_dim (32): copy the
    # projection weights too
    rpi = rr.vq.project_in
    rlin = rpi if hasattr(rpi, 'weight') else rpi[0]
    oo.vq.project_in_linear.kernel.value = jnp.asarray(t2n(rlin.weight).T)
    oo.vq.project_in_linear.bias.value = jnp.asarray(t2n(rlin.bias))
    rpo = rr.vq.project_out
    rlout = rpo if hasattr(rpo, 'weight') else rpo[0]
    oo.vq.project_out_linear.kernel.value = jnp.asarray(t2n(rlout.weight).T)
    oo.vq.project_out_linear.bias.value = jnp.asarray(t2n(rlout.bias))
    x = np.random.default_rng(25).standard_normal((2, 10, 16)).astype(np.float32)
    ri = rr(torch.from_numpy(x))
    oi = oo(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()


def test_fsp_parity_deterministic():
    # quantize_rate=1 -> deterministic midpoint quantization (reference
    # tests/test_fsp.py:70-77 relies on this)
    rfsp = ref.FSP(levels=[8, 6, 5], quantize_rate=1.0)
    ofsp = vqtpu.FSP(levels=[8, 6, 5], quantize_rate=1.0, rngs=nnx.Rngs(0))
    rfsp.eval()
    ofsp.eval()
    x = np.random.default_rng(26).standard_normal((2, 10, 3)).astype(np.float32)
    rout = rfsp(torch.from_numpy(x))
    oout = ofsp(jnp.asarray(x))
    rq, ri = rout[0], rout[1]
    oq, oi = oout[0], oout[1]
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-5, what='fsp quantized')


def test_residual_fsq_parity():
    rr = ref.ResidualFSQ(dim=4, levels=[8, 5, 5, 3], num_quantizers=3)
    oo = vqtpu.ResidualFSQ(dim=4, levels=[8, 5, 5, 3], num_quantizers=3,
                           rngs=nnx.Rngs(0))
    rr.eval()
    oo.eval()
    x = np.random.default_rng(27).standard_normal((2, 10, 4)).astype(np.float32)
    rq, ri = rr(torch.from_numpy(x))
    oq, oi = oo(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-5, what='residual fsq quantized')
    rdec = rr.get_output_from_indices(ri)
    odec = oo.get_output_from_indices(oi)
    assert_close(t2n(rdec), odec, atol=1e-5, what='residual fsq decode')


def test_residual_lfq_parity():
    rr = ref.ResidualLFQ(dim=8, codebook_size=2 ** 8, num_quantizers=3)
    oo = vqtpu.ResidualLFQ(dim=8, codebook_size=2 ** 8, num_quantizers=3,
                           rngs=nnx.Rngs(0))
    rr.eval()
    oo.eval()
    x = np.random.default_rng(28).standard_normal((2, 10, 8)).astype(np.float32)
    rq, ri, rl = rr(torch.from_numpy(x))
    oq, oi, ol = oo(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-5, what='residual lfq quantized')


# ---------------------------------------------------------------------------
# Batch 2: BinaryMapper, HierarchicalVQ, GroupedResidualVQ, QINCo, affine,
# spherical LFQ, dropout decode
# ---------------------------------------------------------------------------

def _copy_linear(tlin, jlin):
    jlin.kernel.value = jnp.asarray(t2n(tlin.weight).T)
    if tlin.bias is not None:
        jlin.bias.value = jnp.asarray(t2n(tlin.bias))


def test_binary_mapper_deterministic_parity():
    rbm = ref.BinaryMapper(bits=6, deterministic_on_eval=True)
    obm = vqtpu.BinaryMapper(bits=6, deterministic_on_eval=True,
                             rngs=nnx.Rngs(0))
    rbm.eval()
    obm.eval()
    logits = np.random.default_rng(30).standard_normal((4, 6)).astype(np.float32)
    r_oh, r_ind, r_kl = rbm(torch.from_numpy(logits), return_indices=True)
    o_oh, o_ind, o_kl = obm(jnp.asarray(logits), return_indices=True)
    assert (t2n(r_ind) == np.asarray(o_ind)).all()
    assert_close(t2n(r_oh), o_oh, atol=1e-6, what='bm one-hot')
    # log_prob parity
    r_lp = rbm.log_prob(torch.from_numpy(logits), indices=r_ind)
    o_lp = obm.log_prob(jnp.asarray(logits), indices=o_ind)
    assert_close(t2n(r_lp), o_lp, atol=1e-5, what='bm log_prob')


def test_binary_mapper_kl_aux_parity():
    # aux KL loss in train mode is deterministic given the same sampled bits;
    # compare the analytic KL term on identical one-hot via fixed logits with
    # extreme magnitudes (sampling is then deterministic in both frameworks)
    rbm = ref.BinaryMapper(bits=4)
    obm = vqtpu.BinaryMapper(bits=4, rngs=nnx.Rngs(0))
    logits = (np.random.default_rng(31).standard_normal((8, 4)) * 50)\
        .astype(np.float32)  # saturated -> Bernoulli is deterministic
    r_oh, r_kl = rbm(torch.from_numpy(logits))
    o_oh, o_kl = obm(jnp.asarray(logits))
    assert_close(t2n(r_oh), o_oh, atol=1e-6, what='bm train one-hot')
    assert_close(float(r_kl), float(o_kl), atol=1e-4, what='bm kl aux')


def test_grouped_residual_vq_parity():
    torch.manual_seed(32)
    rg = ref.GroupedResidualVQ(dim=16, groups=2, num_quantizers=3,
                               codebook_size=32)
    og = vqtpu.GroupedResidualVQ(dim=16, groups=2, num_quantizers=3,
                                 codebook_size=32, rngs=nnx.Rngs(0))
    for g, rrvq in enumerate(rg.rvqs):
        for i, layer in enumerate(rrvq.layers):
            ovq = og.rvqs[g].layers[i]
            ovq._codebook.embed.value = jnp.asarray(t2n(layer._codebook.embed))
            ovq._codebook.embed_avg.value = jnp.asarray(
                t2n(layer._codebook.embed_avg))
            ovq._codebook.cluster_size.value = jnp.asarray(
                t2n(layer._codebook.cluster_size))
    rg.eval()
    og.eval()
    x = np.random.default_rng(33).standard_normal((2, 10, 16)).astype(np.float32)
    rq, ri, rl = rg(torch.from_numpy(x))
    oq, oi, ol = og(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-5, what='grouped rvq quantized')


def test_qinco_residual_vq_parity():
    torch.manual_seed(34)
    rr = ref.ResidualVQ(dim=8, num_quantizers=3, codebook_size=16,
                        implicit_neural_codebook=True,
                        mlp_kwargs=dict(depth=2))
    oo = vqtpu.ResidualVQ(dim=8, num_quantizers=3, codebook_size=16,
                          implicit_neural_codebook=True,
                          mlp_kwargs=dict(depth=2), rngs=nnx.Rngs(0))
    for i, layer in enumerate(rr.layers):
        ovq = oo.layers[i]
        ovq._codebook.embed.value = jnp.asarray(t2n(layer._codebook.embed))
        ovq._codebook.embed_avg.value = jnp.asarray(
            t2n(layer._codebook.embed_avg))
        ovq._codebook.cluster_size.value = jnp.asarray(
            t2n(layer._codebook.cluster_size))
    # copy QINCo MLPs (layers 2..N): reference rr.mlps / ours oo.mlps
    for rmlp, omlp in zip(rr.mlps, oo.mlps):
        _copy_linear(rmlp.proj_in, omlp.proj_in)
        for rblock, oblock in zip(rmlp.layers, omlp.layers):
            _copy_linear(rblock[0], oblock.lin1)
            _copy_linear(rblock[2], oblock.lin2)
    rr.eval()
    oo.eval()
    x = np.random.default_rng(35).standard_normal((2, 6, 8)).astype(np.float32)
    rq, ri, rl = rr(torch.from_numpy(x))
    oq, oi, ol = oo(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-4, what='qinco quantized')
    # decode path (layer-by-layer re-transform)
    rdec = rr.get_output_from_indices(ri)
    odec = oo.get_output_from_indices(oi)
    assert_close(t2n(rdec), odec, atol=1e-4, what='qinco decode')


def test_vq_affine_param_parity():
    rvq, ovq = make_pair(affine_param=True, sync_affine_param=False,
                         decay=0.8)
    x = np.random.default_rng(36).standard_normal((2, 24, 16)).astype(np.float32)
    for step in range(3):
        xs = x + step * 0.1
        rq, ri, rl = rvq(torch.from_numpy(xs))
        oq, oi, ol = ovq(jnp.asarray(xs))
        assert (t2n(ri) == np.asarray(oi)).all(), f'step {step}'
    assert_close(t2n(rq), oq, atol=1e-5, what='affine quantized')
    assert_close(
        t2n(rvq._codebook.batch_mean),
        ovq._codebook.batch_mean.value, atol=1e-5, what='batch_mean',
    )
    assert_close(
        t2n(rvq._codebook.batch_variance),
        ovq._codebook.batch_variance.value, atol=1e-5, what='batch_variance',
    )


def test_lfq_spherical_bsq_parity():
    rl = ref.LFQ(codebook_size=2 ** 6, dim=6, spherical=True)
    ol = vqtpu.LFQ(codebook_size=2 ** 6, dim=6, spherical=True,
                   rngs=nnx.Rngs(0))
    rl.eval()
    ol.eval()
    x = np.random.default_rng(37).standard_normal((2, 10, 6)).astype(np.float32)
    rq, ri, rent = rl(torch.from_numpy(x))
    oq, oi, oent = ol(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-6, what='bsq quantized')


def test_residual_vq_dropout_decode_parity():
    # decode from indices containing -1 dropout padding must zero those
    # layers' contributions in both frameworks
    torch.manual_seed(38)
    rr = ref.ResidualVQ(dim=8, num_quantizers=4, codebook_size=16)
    oo = vqtpu.ResidualVQ(dim=8, num_quantizers=4, codebook_size=16,
                          rngs=nnx.Rngs(0))
    for i, layer in enumerate(rr.layers):
        ovq = oo.layers[i]
        ovq._codebook.embed.value = jnp.asarray(t2n(layer._codebook.embed))
    indices = np.random.default_rng(39).integers(0, 16, (2, 6, 4))
    indices[:, :, 2:] = -1                      # dropped layers
    rdec = rr.get_output_from_indices(torch.from_numpy(indices))
    odec = oo.get_output_from_indices(jnp.asarray(indices))
    assert_close(t2n(rdec), odec, atol=1e-5, what='dropout decode')


# ---------------------------------------------------------------------------
# Batch 3: beam search, in-place codebook optimizer, CE-loss-vs-indices,
# sync_update_v
# ---------------------------------------------------------------------------

def test_beam_search_parity():
    torch.manual_seed(40)
    rr = ref.ResidualVQ(dim=8, num_quantizers=3, codebook_size=16,
                        beam_size=4)
    oo = vqtpu.ResidualVQ(dim=8, num_quantizers=3, codebook_size=16,
                          beam_size=4, rngs=nnx.Rngs(0))
    for i, layer in enumerate(rr.layers):
        ovq = oo.layers[i]
        ovq._codebook.embed.value = jnp.asarray(t2n(layer._codebook.embed))
        ovq._codebook.embed_avg.value = jnp.asarray(
            t2n(layer._codebook.embed_avg))
        ovq._codebook.cluster_size.value = jnp.asarray(
            t2n(layer._codebook.cluster_size))
    # train mode, batch 1, freeze_codebook: the reference's eval+beam path
    # cannot handle the topk dim in its eval gather, and its beam einsum
    # assumes batch 1 (its own test_beam.py uses train mode and batch 1)
    x = np.random.default_rng(41).standard_normal((1, 6, 8)).astype(np.float32)
    rq, ri, rl = rr(torch.from_numpy(x), freeze_codebook=True)
    oq, oi, ol = oo(jnp.asarray(x), freeze_codebook=True)
    assert (t2n(ri) == np.asarray(oi)).all(), 'beam indices'
    assert_close(t2n(rq), oq, atol=1e-5, what='beam quantized')


def test_in_place_codebook_optimizer_parity():
    # the inner optimization step: loss.backward() + SGD step + re-quantize
    # (reference vector_quantize_pytorch.py:1186-1210). SGD(lr) has identical
    # math in torch and optax.
    import functools as _ft

    import optax

    torch.manual_seed(42)
    rvq = ref.VectorQuantize(
        dim=16, codebook_size=32, learnable_codebook=True, ema_update=False,
        in_place_codebook_optimizer=_ft.partial(torch.optim.SGD, lr=0.1),
        rotation_trick=False,
    )
    ovq = vqtpu.VectorQuantize(
        dim=16, codebook_size=32, learnable_codebook=True, ema_update=False,
        in_place_codebook_optimizer=optax.sgd(0.1),
        rotation_trick=False, rngs=nnx.Rngs(0),
    )
    ovq._codebook.embed.value = jnp.asarray(t2n(rvq._codebook.embed))
    ovq._codebook.embed_avg.value = jnp.asarray(t2n(rvq._codebook.embed_avg))
    ovq._codebook.cluster_size.value = jnp.asarray(
        t2n(rvq._codebook.cluster_size))

    x = np.random.default_rng(43).standard_normal((2, 12, 16)).astype(np.float32)
    rq, ri, rl = rvq(torch.from_numpy(x))
    oq, oi, ol = ovq(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    # post-inner-step codebook must match (the embedding moved toward x)
    assert_close(
        t2n(rvq._codebook.embed), ovq._codebook.embed.value, atol=1e-5,
        what='embed after inner optimizer step',
    )
    assert_close(t2n(rq), oq, atol=1e-5, what='re-quantized output')


def test_ce_loss_vs_indices_parity():
    rvq, ovq = make_pair()
    x = np.random.default_rng(44).standard_normal((2, 12, 16)).astype(np.float32)
    target = np.random.default_rng(45).integers(0, 32, (2, 12))
    rq, rloss = rvq(torch.from_numpy(x), indices=torch.from_numpy(target))
    oq, oloss = ovq(jnp.asarray(x), indices=jnp.asarray(target))
    assert_close(float(rloss), float(oloss), atol=1e-5, what='ce loss')
    assert_close(t2n(rq), oq, atol=1e-5, what='ce-mode quantized')


def test_sync_update_v_parity():
    import functools as _ft

    import optax

    torch.manual_seed(46)
    kw = dict(dim=16, codebook_size=32, learnable_codebook=True,
              ema_update=False, sync_update_v=0.5, rotation_trick=False)
    rvq = ref.VectorQuantize(
        in_place_codebook_optimizer=_ft.partial(torch.optim.SGD, lr=0.05),
        **kw)
    ovq = vqtpu.VectorQuantize(
        in_place_codebook_optimizer=optax.sgd(0.05), rngs=nnx.Rngs(0), **kw)
    ovq._codebook.embed.value = jnp.asarray(t2n(rvq._codebook.embed))
    ovq._codebook.embed_avg.value = jnp.asarray(t2n(rvq._codebook.embed_avg))
    ovq._codebook.cluster_size.value = jnp.asarray(
        t2n(rvq._codebook.cluster_size))
    x = np.random.default_rng(47).standard_normal((2, 12, 16)).astype(np.float32)
    rq, ri, rl = rvq(torch.from_numpy(x))
    oq, oi, ol = ovq(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-5, what='sync_update_v quantized')


def test_hierarchical_vq_parity():
    torch.manual_seed(50)
    kw = dict(dim=8, codebook_size=16, scales=(1, 2, 4), kmeans_init=False,
              threshold_ema_dead_code=0, quant_resi=0.5, share_quant_resi=1,
              accept_image_fmap=True)
    rh = ref.HierarchicalVQ(**kw)
    oh = vqtpu.HierarchicalVQ(rngs=nnx.Rngs(0), **kw)
    # shared quantizer state
    oh.vq._codebook.embed.value = jnp.asarray(t2n(rh.vq._codebook.embed))
    oh.vq._codebook.embed_avg.value = jnp.asarray(
        t2n(rh.vq._codebook.embed_avg))
    oh.vq._codebook.cluster_size.value = jnp.asarray(
        t2n(rh.vq._codebook.cluster_size))
    # shared Phi conv (torch OIHW -> flax HWIO)
    rconv = rh.phi_shared.conv if rh.phi_shared is not None else rh.phi_levels[0].conv
    oconv = oh.phi_levels[0].conv
    oconv.kernel.value = jnp.asarray(
        np.transpose(t2n(rconv.weight), (2, 3, 1, 0)))
    oconv.bias.value = jnp.asarray(t2n(rconv.bias))

    rh.eval()
    oh.eval()
    fmap = np.random.default_rng(51).standard_normal((2, 8, 4, 4)).astype(np.float32)
    r_out = rh(torch.from_numpy(fmap))
    o_out = oh(jnp.asarray(fmap))
    r_recon, r_inds = r_out[0], r_out[1]
    o_recon, o_inds = o_out[0], o_out[1]
    for i, (ri, oi) in enumerate(zip(r_inds, o_inds)):
        assert (t2n(ri) == np.asarray(oi)).all(), f'scale {i} indices'
    assert_close(t2n(r_recon), o_recon, atol=1e-5, what='hq recon')
    # decode path
    r_dec = rh.get_output_from_indices(r_inds)
    o_dec = oh.get_output_from_indices(o_inds)
    assert_close(t2n(r_dec), o_dec, atol=1e-5, what='hq decode')


def test_latent_quantize_inplace_optimizer_upstream_broken():
    """The reference's LatentQuantize in-place-optimizer path crashes on any
    training forward: `self.optimize_values` is read at
    latent_quantization.py:264 but never assigned in __init__ (:129-137).
    Golden parity is therefore impossible; we pin the upstream breakage here
    and test our working implementation behaviorally in
    tests/test_quantizers_misc.py."""
    import functools as _ft

    torch.manual_seed(52)
    rlq = ref.LatentQuantize(
        levels=[5, 5, 8], dim=9,
        in_place_codebook_optimizer=_ft.partial(torch.optim.SGD, lr=0.1))
    x = torch.from_numpy(
        np.random.default_rng(53).standard_normal((2, 9, 10)).astype(np.float32))
    with pytest.raises(AttributeError, match='optimize_values'):
        rlq(x)


def test_grouped_residual_fsq_parity():
    rg = ref.GroupedResidualFSQ(dim=8, groups=2, levels=[8, 5, 5, 3],
                                num_quantizers=2)
    og = vqtpu.GroupedResidualFSQ(dim=8, groups=2, levels=[8, 5, 5, 3],
                                  num_quantizers=2, rngs=nnx.Rngs(0))
    rg.eval()
    og.eval()
    x = np.random.default_rng(60).standard_normal((2, 10, 8)).astype(np.float32)
    rq, ri = rg(torch.from_numpy(x))
    oq, oi = og(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-5, what='grouped residual fsq')


def test_grouped_residual_lfq_parity():
    rg = ref.GroupedResidualLFQ(dim=8, groups=2, codebook_size=2 ** 4,
                                num_quantizers=2)
    og = vqtpu.GroupedResidualLFQ(dim=8, groups=2, codebook_size=2 ** 4,
                                  num_quantizers=2, rngs=nnx.Rngs(0))
    rg.eval()
    og.eval()
    x = np.random.default_rng(61).standard_normal((2, 10, 8)).astype(np.float32)
    rq, ri, rl = rg(torch.from_numpy(x))
    oq, oi, ol = og(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-5, what='grouped residual lfq')


def test_lfq_masked_entropy_reference_bug_pinned():
    """Upstream bug: with a mask, the reference boolean-indexes
    original_input (already collapsing batch x tokens) and then rearranges
    'b n ... -> (b n) ...', which merges the token and codebook axes — its
    avg_prob reduce('... c d -> c d') then reduces NOTHING, so the masked
    "codebook entropy" degenerates to the per-sample entropy (zero diversity
    pressure). Ours computes the correct mask-weighted batch distribution.
    Pin both behaviors."""
    rl = ref.LFQ(codebook_size=2 ** 6, dim=6)
    ol = vqtpu.LFQ(codebook_size=2 ** 6, dim=6, rngs=nnx.Rngs(0))
    x = np.random.default_rng(70).standard_normal((2, 10, 6)).astype(np.float32)
    mask = np.zeros((2, 10), bool)
    mask[0, :4] = True
    mask[1, :] = True
    _, rbd = rl(torch.from_numpy(x), mask=torch.from_numpy(mask),
                return_loss_breakdown=True)
    out = ol(jnp.asarray(x), mask=jnp.asarray(mask),
             return_loss_breakdown=True)
    obd = out[-1]
    # per-sample entropy agrees exactly
    assert_close(float(rbd.per_sample_entropy), float(obd.per_sample_entropy),
                 atol=1e-6, what='masked per-sample entropy')
    # reference's batch entropy collapses to its per-sample entropy (bug)
    assert abs(float(rbd.batch_entropy)
               - float(rbd.per_sample_entropy)) < 1e-8
    # ours is the true entropy of the masked-weighted code distribution
    probs_valid = np.asarray(jax.nn.softmax(
        2.0 * jnp.asarray(x[mask]) @ jnp.asarray(
            np.array(rl.codebook.float().numpy())).T * 100.0, axis=-1))
    avg = probs_valid.mean(0)
    want = float(-(avg * np.log(np.maximum(avg, 1e-5))).sum())
    assert_close(float(obd.batch_entropy), want, atol=1e-3,
                 what='our masked batch entropy')


def test_fsq_preserve_symmetry_parity():
    levels = [2, 4, 4]
    rf = ref.FSQ(levels=levels, preserve_symmetry=True)
    of = vqtpu.FSQ(levels=levels, preserve_symmetry=True, rngs=nnx.Rngs(0))
    rf.eval()
    of.eval()
    x = np.random.default_rng(71).standard_normal((2, 10, 3)).astype(np.float32)
    rq, ri = rf(torch.from_numpy(x))
    oq, oi = of(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-6, what='preserve_symmetry codes')


def test_residual_sim_vq_parity():
    torch.manual_seed(80)
    rr = ref.ResidualSimVQ(dim=16, num_quantizers=3, codebook_size=32)
    oo = vqtpu.ResidualSimVQ(dim=16, num_quantizers=3, codebook_size=32,
                             rngs=nnx.Rngs(0))
    for i, layer in enumerate(rr.layers):
        ol = oo.layers[i]
        ol.frozen_codebook.value = jnp.asarray(t2n(layer.frozen_codebook))
        _copy_linear_sim(layer.code_transform, ol.code_transform)
    rr.eval()
    oo.eval()
    x = np.random.default_rng(81).standard_normal((2, 10, 16)).astype(np.float32)
    rq, ri, rl = rr(torch.from_numpy(x))
    oq, oi, ol_ = oo(jnp.asarray(x))
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(t2n(rq), oq, atol=1e-5, what='residual simvq quantized')


def _copy_linear_sim(tlin, jlin):
    jlin.kernel.value = jnp.asarray(t2n(tlin.weight).T)
    if getattr(tlin, 'bias', None) is not None and getattr(
            jlin, 'bias', None) is not None:
        jlin.bias.value = jnp.asarray(t2n(tlin.bias))


def test_vq_commitment_cross_entropy_loss_parity():
    rvq, ovq = make_pair(commitment_use_cross_entropy_loss=True)
    x = np.random.default_rng(90).standard_normal((2, 12, 16)).astype(np.float32)
    rq, ri, rl = rvq(torch.from_numpy(x), freeze_codebook=True)
    oq, oi, ol = ovq(jnp.asarray(x), freeze_codebook=True)
    assert (t2n(ri) == np.asarray(oi)).all()
    assert_close(float(rl), float(ol), atol=1e-5, what='CE commitment loss')


def test_multihead_residual_vq_rejected_in_both():
    """Multi-headed ResidualVQ is unsupported upstream (residual_vq.py
    asserts heads == 1) and vqtpu mirrors the restriction — pin both."""
    kw = dict(dim=16, num_quantizers=2, codebook_size=16, heads=2,
              codebook_dim=8, separate_codebook_per_head=True)
    with pytest.raises(AssertionError, match='not compatible'):
        ref.ResidualVQ(**kw)
    with pytest.raises(AssertionError, match='not compatible'):
        vqtpu.ResidualVQ(rngs=nnx.Rngs(0), **kw)


def test_hierarchical_vq_multi_smoother_parity():
    """share_quant_resi=2 over 4 scales: the scale->smoother index mapping
    (reference hierarchical_vq.py:87-102 runtime branching; vqtpu resolves
    it once into a ctor-time index table) must pick the same smoother for
    every scale — pinned by copying BOTH convs and comparing the forward."""
    torch.manual_seed(52)
    kw = dict(dim=8, codebook_size=16, scales=(1, 2, 3, 4),
              kmeans_init=False, threshold_ema_dead_code=0, quant_resi=0.5,
              share_quant_resi=2, accept_image_fmap=True)
    rh = ref.HierarchicalVQ(**kw)
    oh = vqtpu.HierarchicalVQ(rngs=nnx.Rngs(0), **kw)
    oh.vq._codebook.embed.value = jnp.asarray(t2n(rh.vq._codebook.embed))
    oh.vq._codebook.embed_avg.value = jnp.asarray(
        t2n(rh.vq._codebook.embed_avg))
    oh.vq._codebook.cluster_size.value = jnp.asarray(
        t2n(rh.vq._codebook.cluster_size))
    assert rh.phi_shared is None and len(rh.phi_levels) == 2
    assert len(oh.phi_levels) == 2
    for rphi, ophi in zip(rh.phi_levels, oh.phi_levels):
        ophi.conv.kernel.value = jnp.asarray(
            np.transpose(t2n(rphi.conv.weight), (2, 3, 1, 0)))
        ophi.conv.bias.value = jnp.asarray(t2n(rphi.conv.bias))

    rh.eval()
    oh.eval()
    fmap = np.random.default_rng(53).standard_normal(
        (2, 8, 4, 4)).astype(np.float32)
    r_out = rh(torch.from_numpy(fmap))
    o_out = oh(jnp.asarray(fmap))
    for i, (ri, oi) in enumerate(zip(r_out[1], o_out[1])):
        assert (t2n(ri) == np.asarray(oi)).all(), f'scale {i} indices'
    assert_close(t2n(r_out[0]), o_out[0], atol=1e-5, what='hq multi-phi recon')
