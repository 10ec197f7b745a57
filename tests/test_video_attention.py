"""Video/channel attention family: exact round trips + logdet consistency."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpnf_tpu.ops.video_attention import (ChannelFirstOrderAttention,
                                          ChannelInvertibleAttention,
                                          SpatioTemporalInvertibleAttention,
                                          TemporalFirstOrderAttention,
                                          TemporalInvertibleAttention)

KEY = jax.random.PRNGKey(0)


def _roundtrip(mod, params, x, **kw):
    zero = jnp.zeros((x.shape[0],))
    y, ld = mod.forward(params, x, zero, **kw)
    x2, ld2 = mod.inverse(params, y, ld, **kw)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-3)
    assert not np.allclose(np.asarray(y), np.asarray(x))
    return y, ld


def test_temporal_second_order():
    at = TemporalInvertibleAttention(dim=3 * 4 * 4, num_heads=2)
    params = at.init(KEY)
    x = jax.random.normal(KEY, (2, 6, 3, 4, 4))
    _roundtrip(at, params, x)
    _roundtrip(at, params, x, permute=True)


def test_channel_second_order():
    at = ChannelInvertibleAttention(dim=16, num_heads=1)
    params = at.init(KEY)
    x = jax.random.normal(KEY, (2, 8, 4, 4))
    _roundtrip(at, params, x)


def test_channel_second_order_exact_logdet():
    """Block-form logdet equals the brute-force Jacobian slogdet."""
    at = ChannelInvertibleAttention(dim=4, num_heads=1)
    params = at.init(KEY)
    x = jax.random.normal(KEY, (1, 4, 2, 2))

    def flat(v):
        y, _ = at.forward(params, v.reshape(1, 4, 2, 2), jnp.zeros((1,)))
        return y.reshape(-1)

    jac = jax.jacrev(flat)(x.reshape(-1))
    _, ld = at.forward(params, x, jnp.zeros((1,)))
    np.testing.assert_allclose(float(ld[0]),
                               float(jnp.linalg.slogdet(jac)[1]),
                               rtol=1e-4, atol=1e-4)


def test_spatiotemporal():
    at = SpatioTemporalInvertibleAttention(dim=3 * 2 * 4, num_heads=1)
    params = at.init(KEY)
    x = jax.random.normal(KEY, (2, 3, 3, 4, 4))  # tokens = 6 half-frames
    _roundtrip(at, params, x)


def test_temporal_first_order():
    at = TemporalFirstOrderAttention(n_tokens=6)
    params = at.init(KEY)
    x = jax.random.normal(KEY, (2, 6, 3, 4, 4))
    _roundtrip(at, params, x)
    _roundtrip(at, params, x, permute=True)


def test_channel_first_order():
    at = ChannelFirstOrderAttention(n_tokens=8)
    params = at.init(KEY)
    x = jax.random.normal(KEY, (2, 8, 4, 4))
    _roundtrip(at, params, x)
