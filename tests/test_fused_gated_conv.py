"""Fused GatedConv kernel (ops/pallas/fused_gated_conv.py): the jnp
reference path must match the unfused GatedConv.apply chain (values AND
grads), since the TPU kernel is validated against that same reference
(scripts/check_fused_gconv_tpu.py). Reference math:
flow_modules/mixlogcdf_nn.py:227-260 + the ConvAttnBlock residual."""
import jax
import jax.numpy as jnp
import numpy as np

from gpnf_tpu.ops.mixlogcdf import ConvAttnBlock, GatedConv
from gpnf_tpu.ops.pallas.fused_gated_conv import fused_gated_conv

KEY = jax.random.PRNGKey(0)


def _setup(c=16, h=8, w=8, b=4, drop=0.0):
    gc = GatedConv(c, drop)
    params = gc.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c), jnp.float32)
    return gc, params, x


def test_fused_reference_matches_unfused_chain():
    gc, params, x = _setup()
    want = gc.apply(params, x, layout="NHWC") + x
    got = gc.apply_fused(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_unfused():
    gc, params, x = _setup()

    def loss_fused(params, x):
        return jnp.sum(jnp.sin(gc.apply_fused(params, x)))

    def loss_ref(params, x):
        return jnp.sum(jnp.sin(gc.apply(params, x, layout="NHWC") + x))

    gf = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_dropout_deterministic_and_channelwise():
    gc, params, x = _setup(drop=0.5)
    r = jax.random.PRNGKey(7)
    y1 = gc.apply_fused(params, x, rng=r, train=True)
    y2 = gc.apply_fused(params, x, rng=r, train=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = gc.apply_fused(params, x, rng=jax.random.PRNGKey(8), train=True)
    assert np.abs(np.asarray(y1) - np.asarray(y3)).max() > 1e-6
    # eval mode ignores the rate entirely
    y4 = gc.apply_fused(params, x, rng=r, train=False)
    np.testing.assert_allclose(np.asarray(y4),
                               np.asarray(gc.apply(params, x, layout="NHWC") + x),
                               rtol=1e-5, atol=1e-5)


def test_convattnblock_fused_flag_matches_unfused():
    """ConvAttnBlock with fused_gconv=True must equal the plain block
    (eval mode; on CPU both route through jnp math)."""
    c = 12
    blk_ref = ConvAttnBlock(c, 0.0, use_attn=True)
    blk_fused = ConvAttnBlock(c, 0.0, use_attn=True, fused_gconv=True)
    params = blk_ref.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, c), jnp.float32)
    want = blk_ref.apply(params, x, mark_ckpt=False, layout="NHWC")
    got = blk_fused.apply(params, x, mark_ckpt=False, layout="NHWC")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_marscf_fused_flag_nll_parity():
    """Full-model NLL with fused_gated_conv=True equals the default path
    (deterministic eval forward; identical math through the flag)."""
    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow

    base = dict(image_shape=(8, 8, 3), L=2, K=2, hidden_channels=16,
                coupling="mixlogcdf", num_blocks=2, num_components=4,
                drop_prob=0.0, prior="gaussian", use_attention=True)
    m0 = MarScfFlow(MarScfConfig(**base))
    m1 = MarScfFlow(MarScfConfig(**base, fused_gated_conv=True))
    params = m0.init(KEY)
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 3, 8, 8)) - 0.5
    logdet = jnp.zeros((4,), jnp.float32)
    z0, o0 = m0.encode(params, x, logdet)
    z1, o1 = m1.encode(params, x, logdet)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0),
                               rtol=1e-5, atol=1e-5)


def test_fused_kernel_taps_equal_lax_conv():
    """The tap-matmul conv formulation (what the TPU kernel executes) must
    equal lax's SAME conv — checked via the pure-jnp tap functions."""
    from gpnf_tpu.ops.pallas.fused_gated_conv import (_conv3x3_taps,
                                                      _conv3x3_taps_T)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 4)).astype(np.float32))
    got = _conv3x3_taps(x, w, 4)
    want = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (3, 2, 0, 1)), (1, 1), "SAME",
        dimension_numbers=("NHWC", "OIHW", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # transpose form = VJP of the conv w.r.t. its input
    g = jnp.asarray(rng.standard_normal(want.shape).astype(np.float32))
    got_t = _conv3x3_taps_T(g, w, 8)
    _, vjp = jax.vjp(lambda t: _conv3x3_taps(t, w, 4), x)
    (want_t,) = vjp(g)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-5, atol=1e-5)
