"""Numerical parity against the actual reference implementation.

These tests import the torch reference from /root/reference (read-only),
run it on CPU (monkeypatching the hard-coded .cuda() calls away), transplant
its weights into the JAX modules, and require outputs and log-dets to match
to fp32 tolerance. This pins the semantics of every layer family to the
reference — the bits/dim-parity prerequisite (BASELINE.md) that doesn't need
the real datasets.

Known intentional deviation: InvertibleConv1x1's log-det pixel count (the
reference uses W*W — common_modules.py:86,104); tests use square inputs
where both agree.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_transplant import patch_cuda_away, t2n  # stubs torchvision/PIL etc.

import jax
import jax.numpy as jnp

KEY = jax.random.PRNGKey(0)
RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _no_cuda(monkeypatch):
    patch_cuda_away(monkeypatch)


def _x(shape, scale=1.0):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


# ---------------------------------------------------------------------------
def test_actnorm_parity():
    from flow_modules.common_modules import Actnormlayer

    from gpnf_tpu.ops.actnorm import ActNorm

    ref = Actnormlayer(6)
    ref.eval()
    with torch.no_grad():
        ref.bias.copy_(torch.tensor(_x((1, 6, 1, 1), 0.3)))
        ref.logs.copy_(torch.tensor(_x((1, 6, 1, 1), 0.2)))
        ref.is_initialized += 1.0

    x = _x((2, 6, 8, 8))
    y_ref, ld_ref = ref(torch.tensor(x), torch.zeros(2))

    mine = ActNorm(6)
    params = {"bias": jnp.asarray(t2n(ref.bias).reshape(-1)),
              "logs": jnp.asarray(t2n(ref.logs).reshape(-1))}
    y, ld = mine.forward(params, jnp.asarray(x), jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(y), t2n(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), t2n(ld_ref) * np.ones(2),
                               rtol=1e-5, atol=1e-4)


def test_invconv_plu_parity():
    from flow_modules.common_modules import InvertibleConv1x1

    from gpnf_tpu.ops.invconv import InvConv1x1

    ref = InvertibleConv1x1(8, LU_decomposed=True)
    x = _x((2, 8, 6, 6))
    y_ref, ld_ref = ref(torch.tensor(x), torch.zeros(2))

    mine = InvConv1x1(8)
    params = {"p": jnp.asarray(t2n(ref.p)),
              "l": jnp.asarray(np.tril(t2n(ref.l), -1)),
              "u": jnp.asarray(np.triu(t2n(ref.u), 1)),
              "sign_s": jnp.asarray(t2n(ref.sign_s)),
              "log_s": jnp.asarray(t2n(ref.log_s))}
    y, ld = mine.forward(params, jnp.asarray(x), jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(y), t2n(y_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld), t2n(ld_ref) * np.ones(2),
                               rtol=1e-4, atol=1e-4)

    x_rec_ref, _ = ref(torch.tensor(t2n(y_ref)), torch.zeros(2), reverse=True)
    x_rec, _ = mine.inverse(params, y, ld)
    np.testing.assert_allclose(np.asarray(x_rec), t2n(x_rec_ref), rtol=1e-3,
                               atol=1e-4)


def _copy_conv2d(ref_conv):
    """flow_modules.affine_coupling.Conv2d (conv + fused actnorm) -> params."""
    p = {"w": jnp.asarray(t2n(ref_conv.weight))}
    if ref_conv.do_actnorm:
        p["an_bias"] = jnp.asarray(t2n(ref_conv.actnorm.bias).reshape(-1))
        p["an_logs"] = jnp.asarray(t2n(ref_conv.actnorm.logs).reshape(-1))
    else:
        p["b"] = jnp.asarray(t2n(ref_conv.bias))
    return p


def _copy_conv2dzeros(ref_conv):
    return {"w": jnp.asarray(t2n(ref_conv.weight)),
            "b": jnp.asarray(t2n(ref_conv.bias)),
            "logs": jnp.asarray(t2n(ref_conv.logs).reshape(-1))}


def test_affine_coupling_parity():
    from flow_modules.affine_coupling import AffineCoupling as RefCoupling

    from gpnf_tpu.ops.coupling import AffineCoupling

    ref = RefCoupling(8, 8, 16)
    ref.eval()
    # mark the fused actnorms initialized with random (non-trivial) params
    with torch.no_grad():
        for conv in (ref.NN_net.conv1, ref.NN_net.conv2):
            conv.actnorm.bias.copy_(torch.tensor(_x((1, 16, 1, 1), 0.2)))
            conv.actnorm.logs.copy_(torch.tensor(_x((1, 16, 1, 1), 0.2)))
            conv.actnorm.is_initialized += 1.0
        ref.NN_net.conv3.weight.copy_(torch.tensor(_x((8, 16, 3, 3), 0.05)))
        ref.NN_net.conv3.logs.copy_(torch.tensor(_x((8, 1, 1), 0.1)))

    x = _x((2, 8, 6, 6))
    y_ref, ld_ref = ref(torch.tensor(x), torch.zeros(2))

    mine = AffineCoupling(8, 8, 16)
    params = {"net": {
        "conv1": _copy_conv2d(ref.NN_net.conv1),
        "conv2": _copy_conv2d(ref.NN_net.conv2),
        "conv3": _copy_conv2dzeros(ref.NN_net.conv3),
    }}
    y, ld = mine.forward(params, jnp.asarray(x), jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(y), t2n(y_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), t2n(ld_ref), rtol=1e-4, atol=1e-4)


def _copy_wnconv(ref):
    conv = ref.conv  # torch weight_norm: weight_v, weight_g
    return {"v": jnp.asarray(t2n(conv.weight_v)),
            "g": jnp.asarray(t2n(conv.weight_g).reshape(-1)),
            "b": jnp.asarray(t2n(conv.bias))}


def _copy_wndense(ref, bias=True):
    p = {"v": jnp.asarray(t2n(ref.weight_v)),
         "g": jnp.asarray(t2n(ref.weight_g).reshape(-1))}
    if bias:
        p["b"] = jnp.asarray(t2n(ref.bias))
    return p


def test_mixlogcdf_coupling_parity():
    from flow_modules.mixlogcdf_coupling import MixLogCDFCoupling as RefML

    from gpnf_tpu.ops.mixlogcdf import MixLogCDFCoupling

    ref = RefML(8, 12, num_blocks=2, num_components=3, drop_prob=0.0)
    ref.eval()
    x = _x((2, 8, 6, 6), 0.4)
    with torch.no_grad():
        y_ref, ld_ref = ref(torch.tensor(x), torch.zeros(2))

    mine = MixLogCDFCoupling(8, 12, num_blocks=2, num_components=3,
                             drop_prob=0.0)

    blocks = []
    for blk in ref.nn.mid_convs:
        bp = {
            "conv": {"conv": _copy_wnconv(blk.conv.conv),
                     "gate": _copy_wnconv(blk.conv.gate)},
            "norm1": {"gamma": jnp.asarray(t2n(blk.norm_1.weight)),
                      "beta": jnp.asarray(t2n(blk.norm_1.bias))},
            "attn": {"in_proj": _copy_wndense(blk.attn.in_proj, bias=False),
                     "gate": _copy_wndense(blk.attn.gate)},
            "norm2": {"gamma": jnp.asarray(t2n(blk.norm_2.weight)),
                      "beta": jnp.asarray(t2n(blk.norm_2.bias))},
        }
        blocks.append(bp)
    rescale_w = t2n(ref.nn.rescale.weight_g) * np.sign(t2n(ref.nn.rescale.weight_v))
    params = {"net": {
        "in_conv": _copy_wnconv(ref.nn.in_conv),
        "blocks": blocks,
        "out_conv": _copy_wnconv(ref.nn.out_conv),
        "rescale": jnp.asarray(rescale_w),
    }}

    y, ld = mine.forward(params, jnp.asarray(x), jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(y), t2n(y_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld), t2n(ld_ref), rtol=2e-4, atol=2e-3)

    # inverse parity (bisection)
    with torch.no_grad():
        x_ref, _ = ref(torch.tensor(t2n(y_ref)), torch.zeros(2), reverse=True)
    x_mine, _ = mine.inverse(params, y, ld)
    np.testing.assert_allclose(np.asarray(x_mine), t2n(x_ref), rtol=1e-3,
                               atol=1e-4)


def test_convlstm_prior_parity():
    from mar_prior.corr_prior import ChannelPriorUniScale as RefPrior

    from gpnf_tpu.models.prior import ChannelPriorUniScale

    torch.manual_seed(0)
    ref = RefPrior(2, 3, 16, 16, level=1, tot_levels=2, hidden_size=8,
                   num_layers=1, dp_rate=0.0)
    ref.eval()

    mine = ChannelPriorUniScale(3, 16, 16, level=1, tot_levels=2,
                                hidden_size=8, num_layers=1)
    enc = {
        "embed_w": jnp.asarray(t2n(ref.prior_lstm.conv_embed.weight)),
        "embed_b": jnp.asarray(t2n(ref.prior_lstm.conv_embed.bias)),
        "out_w": jnp.asarray(t2n(ref.prior_lstm.conv_out1.weight)),
        "out_b": jnp.asarray(t2n(ref.prior_lstm.conv_out1.bias)),
        "lstm": {"layers": [{
            "w_ih": jnp.asarray(t2n(ref.prior_lstm.lstm.weight_ih_l0)),
            "w_hh": jnp.asarray(t2n(ref.prior_lstm.lstm.weight_hh_l0)),
            "b_ih": jnp.asarray(t2n(ref.prior_lstm.lstm.bias_ih_l0)),
            "b_hh": jnp.asarray(t2n(ref.prior_lstm.lstm.bias_hh_l0)),
        }]},
    }
    params = {
        "encoder": enc,
        "cond": {
            "w1": jnp.asarray(t2n(ref.z1_cond_network[0].weight)),
            "b1": jnp.asarray(t2n(ref.z1_cond_network[0].bias)),
            "w2": jnp.asarray(t2n(ref.z1_cond_network[2].weight)),
            "b2": jnp.asarray(t2n(ref.z1_cond_network[2].bias)),
        },
    }

    z1 = _x((2, 6, 8, 8))
    z2 = _x((2, 6, 8, 8))
    with torch.no_grad():
        ll_ref = ref.get_likelihood((torch.tensor(z1), torch.tensor(z2)))
    ll = mine.log_likelihood(params, (jnp.asarray(z1), jnp.asarray(z2)))
    np.testing.assert_allclose(np.asarray(ll), t2n(ll_ref), rtol=1e-4, atol=1e-3)


def test_transformer_attention_parity():
    from flow_modules.transformer import Transformer_attn

    from gpnf_tpu.ops.attention import InvertibleAttention

    torch.manual_seed(0)
    ref = Transformer_attn(6)
    ref.eval()

    mine = InvertibleAttention(6, num_heads=3)
    params = {
        "wq": jnp.stack([jnp.asarray(t2n(getattr(ref, f"convq{i}")))[:, :, 0, 0]
                         for i in (1, 2, 3)]),
        "wk": jnp.stack([jnp.asarray(t2n(getattr(ref, f"convk{i}")))[:, :, 0, 0]
                         for i in (1, 2, 3)]),
        "offset": jnp.asarray(t2n(ref.offset).reshape(-1)),
        "offset2": jnp.asarray(t2n(ref.offset2).reshape(-1)),
        "offset3": jnp.asarray(t2n(ref.offset3).reshape(-1)),
        "scale": jnp.asarray(t2n(ref.scale).reshape(-1)),
    }

    x = _x((2, 6, 8, 8))
    for permute in (False, True):
        with torch.no_grad():
            y_ref, ld_ref = ref(torch.tensor(x), logdet=torch.zeros(2),
                                permute=permute)
        y, ld = mine.forward(params, jnp.asarray(x), jnp.zeros((2,)),
                             permute=permute)
        np.testing.assert_allclose(np.asarray(y), t2n(y_ref), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(ld), t2n(ld_ref), rtol=1e-4,
                                   atol=1e-3)

        with torch.no_grad():
            x_ref, _ = ref(torch.tensor(t2n(y_ref)), logdet=torch.zeros(2),
                           reverse=True, permute=permute)
        x_mine, _ = mine.inverse(params, y, ld, permute=permute)
        np.testing.assert_allclose(np.asarray(x_mine), t2n(x_ref), rtol=1e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(x_mine), x, rtol=1e-3, atol=1e-4)
