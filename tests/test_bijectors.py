"""Per-bijector invariants: inverse(forward(x)) == x, logdet matches the exact
Jacobian slogdet on small shapes, and forward/inverse logdets negate.

Replaces the reference's manual scripts (test_transformer.py, test_code.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpnf_tpu.ops import (ActNorm, AffineCoupling, GaussianDiag, InvConv1x1,
                          InvertibleAttention, MixLogCDFCoupling, Squeeze,
                          TupleFlip, Split2dGaussian)

KEY = jax.random.PRNGKey(0)
B, C, H, W = 2, 4, 8, 8


def _x(key=KEY, shape=(B, C, H, W)):
    return jax.random.normal(key, shape)


def exact_logdet(fn, x):
    """slogdet of the full Jacobian of a flattened single-sample bijector."""
    x0 = x[0]

    def flat(v):
        y = fn(v.reshape(x0.shape)[None])[0]
        return y.reshape(-1)

    # jacrev: the fused coupling kernel defines a custom_vjp (no fwd-mode)
    jac = jax.jacrev(flat)(x0.reshape(-1))
    return jnp.linalg.slogdet(jac)[1]


def check_roundtrip_and_logdet(mod, params, x, atol=1e-4, check_exact=True, **kw):
    zero = jnp.zeros((x.shape[0],))
    y, ld_f = mod.forward(params, x, zero, **kw)
    x_rec, ld_r = mod.inverse(params, y, ld_f, **kw)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=atol, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_r), 0.0, atol=atol)
    if check_exact:
        ld_exact = exact_logdet(lambda v: mod.forward(params, v, jnp.zeros((1,)), **kw)[0], x)
        np.testing.assert_allclose(np.asarray(ld_f[0]), np.asarray(ld_exact),
                                   atol=5e-3, rtol=1e-4)


def test_squeeze_roundtrip():
    sq = Squeeze(2)
    x = _x()
    y, ld = sq.forward({}, x, jnp.zeros((B,)))
    assert y.shape == (B, C * 4, H // 2, W // 2)
    x2, ld2 = sq.inverse({}, y, ld)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(ld2), 0.0)


def test_squeeze_matches_reference_ordering():
    # squeeze2d channel order is (c, fh, fw): channel 0 of the output is the
    # top-left subpixel of channel 0 (common_modules.py:12-25).
    x = jnp.arange(B * C * H * W, dtype=jnp.float32).reshape(B, C, H, W)
    y, _ = Squeeze(2).forward({}, x, jnp.zeros((B,)))
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(x[:, 0, 0::2, 0::2]))
    np.testing.assert_allclose(np.asarray(y[:, 1]), np.asarray(x[:, 0, 0::2, 1::2]))
    np.testing.assert_allclose(np.asarray(y[:, 4]), np.asarray(x[:, 1, 0::2, 0::2]))


def test_actnorm():
    an = ActNorm(C)
    params = an.init(KEY)
    params = {"bias": jax.random.normal(KEY, (C,)) * 0.1,
              "logs": jax.random.normal(jax.random.PRNGKey(1), (C,)) * 0.1}
    check_roundtrip_and_logdet(an, params, _x())


def test_actnorm_ddi_normalizes():
    an = ActNorm(C)
    x = _x(jax.random.PRNGKey(3)) * 3.0 + 1.5
    params, y, _ = an.ddi(an.init(KEY), x, jnp.zeros((B,)))
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=(0, 2, 3))), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.std(y, axis=(0, 2, 3))), 1.0, atol=1e-3)


def test_invconv():
    ic = InvConv1x1(C)
    params = ic.init(KEY)
    check_roundtrip_and_logdet(ic, params, _x())


def test_tuple_flip():
    tf = TupleFlip()
    x = _x()
    y, _ = tf.forward({}, x, jnp.zeros((B,)))
    x2, _ = tf.inverse({}, y, jnp.zeros((B,)))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x))


def test_affine_coupling():
    ac = AffineCoupling(C, C, 16)
    params = ac.init(KEY)
    check_roundtrip_and_logdet(ac, params, _x())


def test_mixlogcdf_coupling():
    ml = MixLogCDFCoupling(C, 8, num_blocks=2, num_components=4, drop_prob=0.0)
    params = ml.init(KEY)
    x = _x() * 0.3
    check_roundtrip_and_logdet(ml, params, x, atol=2e-3)


def test_invertible_attention():
    at = InvertibleAttention(C, num_heads=3)
    params = at.init(KEY)
    check_roundtrip_and_logdet(at, params, _x())
    check_roundtrip_and_logdet(at, params, _x(), permute=True)


@pytest.mark.parametrize("score", ["sigmoid", "softmax"])
@pytest.mark.parametrize("permute", [False, True])
def test_attention_quad_path_matches_general(score, permute):
    # square inputs always give n == 4 patches; the image-space quadrant
    # fast path must be bit-compatible (to fp tolerance) with the general
    # patch-transpose path for both score modes and both parities.
    at = InvertibleAttention(C, num_heads=3, score=score)
    params = at.init(jax.random.PRNGKey(7))
    x = _x(jax.random.PRNGKey(8))
    zero = jnp.zeros((B,))
    y_q, ld_q = at.forward(params, x, zero, permute=permute)
    xr_q, _ = at.inverse(params, y_q, ld_q, permute=permute)
    at.use_quad_path = False
    y_g, ld_g = at.forward(params, x, zero, permute=permute)
    xr_g, _ = at.inverse(params, y_g, ld_g, permute=permute)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_g),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_q), np.asarray(ld_g),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xr_q), np.asarray(xr_g),
                               atol=1e-5, rtol=1e-5)

    # gradients flow identically through both paths
    def loss(fn_params, quad):
        at.use_quad_path = quad
        y, ld = at.forward(fn_params, x, zero, permute=permute)
        return jnp.sum(y ** 2) + jnp.sum(ld)

    g_q = jax.grad(lambda p_: loss(p_, True))(params)
    g_g = jax.grad(lambda p_: loss(p_, False))(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_q[k]), np.asarray(g_g[k]),
                                   atol=2e-4, rtol=2e-4, err_msg=k)
    at.use_quad_path = True


def test_attention_permute_changes_output():
    at = InvertibleAttention(C, num_heads=3)
    params = at.init(KEY)
    x = _x()
    y0, _ = at.forward(params, x, jnp.zeros((B,)))
    y1, _ = at.forward(params, x, jnp.zeros((B,)), permute=True)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_split2d_gaussian():
    sp = Split2dGaussian(C)
    params = sp.init(KEY)
    x = _x()
    z1, ld = sp.forward(params, x, jnp.zeros((B,)))
    assert z1.shape == (B, C // 2, H, W)
    # with zero-init conv the prior is standard normal
    _, z2 = x[:, : C // 2], x[:, C // 2 :]
    np.testing.assert_allclose(np.asarray(ld), np.asarray(GaussianDiag.logp(None, None, z2)),
                               rtol=1e-5, atol=1e-5)


def test_gaussian_diag_logp():
    x = _x()
    expected = -0.5 * (x**2 + np.log(2 * np.pi))
    got = GaussianDiag.likelihood(jnp.zeros_like(x), jnp.zeros_like(x), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)
