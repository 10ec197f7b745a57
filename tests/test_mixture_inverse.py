"""Fused mixture-inverse: fixed-point accuracy + implicit-diff gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from gpnf_tpu.ops import logistic
from gpnf_tpu.ops.pallas.fused_mixture_inverse import mixture_inverse, _inv_body

KEY = jax.random.PRNGKey(0)


def _mix(b=8, k=4, d=128):
    ks = jax.random.split(KEY, 3)
    pi = jax.random.normal(ks[0], (b, k, d))
    mu = jax.random.normal(ks[1], (b, k, d)) * 2.0
    s = jax.random.normal(ks[2], (b, k, d)) * 0.4
    return pi, mu, s


def test_inverse_fixed_point():
    pi, mu, s = _mix()
    x_true = jax.random.normal(jax.random.PRNGKey(9), (8, 128)) * 2.0
    y = jnp.clip(jnp.exp(logistic.mixture_log_cdf(x_true, pi, mu, s)),
                 1e-5, 1 - 1e-5)
    x = mixture_inverse(y, pi, mu, s)
    y_rec = jnp.exp(logistic.mixture_log_cdf(x, pi, mu, s))
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=2e-6)


def test_inverse_implicit_gradients():
    """Implicit-diff grads == finite differences."""
    pi, mu, s = _mix(b=8, k=2, d=128)
    y = jnp.clip(jax.random.uniform(jax.random.PRNGKey(3), (8, 128)), 0.05, 0.95)

    def f(mu_):
        return jnp.sum(mixture_inverse(y, pi, mu_, s) ** 2)

    g = jax.grad(f)(mu)
    eps = 1e-3
    direction = jax.random.normal(jax.random.PRNGKey(4), mu.shape)
    fd = (f(mu + eps * direction) - f(mu - eps * direction)) / (2 * eps)
    analytic = jnp.sum(g * direction)
    np.testing.assert_allclose(float(analytic), float(fd), rtol=2e-2)


def test_inverse_grad_wrt_y():
    pi, mu, s = _mix(b=8, k=2, d=128)
    y = jnp.clip(jax.random.uniform(jax.random.PRNGKey(5), (8, 128)), 0.1, 0.9)

    def f(y_):
        return jnp.sum(mixture_inverse(y_, pi, mu, s))

    g = jax.grad(f)(y)
    # dx/dy = 1/pdf(x) > 0
    assert np.all(np.asarray(g) > 0)
    x = mixture_inverse(y, pi, mu, s)
    pdf = jnp.exp(logistic.mixture_log_pdf(x, pi, mu, s))
    np.testing.assert_allclose(np.asarray(g), np.asarray(1.0 / pdf), rtol=1e-4)
