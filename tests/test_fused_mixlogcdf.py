"""Fused mixture kernel vs jnp reference (CPU fallback + interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from gpnf_tpu.ops.pallas import fused_mixlogcdf as fm

KEY = jax.random.PRNGKey(0)


def _inputs(b=8, k=4, d=256):
    ks = jax.random.split(KEY, 6)
    x = jax.random.normal(ks[0], (b, d)) * 0.5
    a = jax.random.normal(ks[1], (b, d)) * 0.1
    bb = jax.random.normal(ks[2], (b, d)) * 0.1
    pi = jax.random.normal(ks[3], (b, k, d))
    mu = jax.random.normal(ks[4], (b, k, d))
    s = jax.random.normal(ks[5], (b, k, d)) * 0.3
    return x, a, bb, pi, mu, s


def test_fused_matches_reference_cpu():
    args = _inputs()
    y, ldj = fm.mixlogcdf_forward(*args)
    y_ref, ldj_ref = fm._reference(*args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(ldj_ref), rtol=1e-5,
                               atol=1e-5)


def test_fused_gradients_match():
    args = _inputs(b=8, k=2, d=128)

    def loss_fused(args):
        y, ldj = fm.mixlogcdf_forward(*args)
        return jnp.sum(y * y) + jnp.sum(ldj)

    def loss_ref(args):
        y, ldj = fm._reference(*args)
        return jnp.sum(y * y) + jnp.sum(ldj)

    g1 = jax.grad(loss_fused)(args)
    g2 = jax.grad(loss_ref)(args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_kernel_interpret_mode():
    from jax.experimental import pallas as pl

    x, a, b, pi, mu, s = _inputs(b=8, k=4, d=256)
    tile_d = 128
    el = pl.BlockSpec((8, tile_d), lambda i, j: (i, j))
    mix = pl.BlockSpec((8, 4, tile_d), lambda i, j: (i, 0, j))
    y, ldj = pl.pallas_call(
        fm._kernel,
        grid=(1, 2),
        in_specs=[el, el, el, mix, mix, mix],
        out_specs=[el, el],
        out_shape=[jax.ShapeDtypeStruct((8, 256), jnp.float32),
                   jax.ShapeDtypeStruct((8, 256), jnp.float32)],
        interpret=True,
    )(x, a, b, pi, mu, s)
    y_ref, ldj_ref = fm._reference(x, a, b, pi, mu, s)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(ldj_ref), rtol=1e-5,
                               atol=1e-5)
