"""Fused inverse-mixture-CDF (Pallas TPU) with implicit-diff gradients.

Sampling profile (scripts/profile_sampling.py) showed the MixLogCDF inverse
dominates reverse-path latency: ~29 sequential device loops per coupling,
each a separate pass over awkwardly-shaped (B,K,C,H,W) tensors. This kernel
runs the whole bisection+Newton iteration inside VMEM on (TILE_B, K, TILE_D)
blocks — one kernel launch per coupling instead of ~29 full-tensor passes.

Gradients: the reference cannot differentiate its bisection at all
(log_dist.py:43-72, python loop). Here the inverse is wrapped in a
custom_vjp using the implicit function theorem at the fixed point
CDF(x; theta) = y:
    dx/dy      = 1 / pdf(x)
    dx/dtheta  = -(dCDF/dtheta) / pdf(x)
so reverse-mode works through sampling (SRFlow's reverse_with_grad path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import logistic

TILE_B = 8
BISECT_ITERS = 26
NEWTON_ITERS = 4


def _pick_tile_d(d: int):
    for t in (512, 384, 256, 128):
        if d % t == 0:
            return t
    return None


def _inv_body(y, log_pi, mu, log_s):
    """Shared bisection+Newton math on (B, K, D) blocks (values only)."""
    inv_s = jnp.exp(-log_s)

    def log_cdf_pdf(x):
        z = (x[:, None, :] - mu) * inv_s
        log_cdf = jax.nn.logsumexp(log_pi + jax.nn.log_sigmoid(z), axis=1)
        log_pdf = jax.nn.logsumexp(
            log_pi + z - log_s - 2.0 * jax.nn.softplus(z), axis=1)
        return log_cdf, log_pdf

    max_scales = jnp.sum(jnp.exp(log_s), axis=1)
    lb0 = jnp.min(mu, axis=1) - 20.0 * max_scales
    ub0 = jnp.max(mu, axis=1) + 20.0 * max_scales
    log_y = jnp.log(y)

    def bisect(_, state):
        x, lb, ub = state
        gt = (log_cdf_pdf(x)[0] > log_y).astype(y.dtype)
        lt = 1.0 - gt
        new_x = gt * (x + lb) * 0.5 + lt * (x + ub) * 0.5
        return new_x, gt * lb + lt * x, gt * x + lt * ub

    x, lb, ub = jax.lax.fori_loop(
        0, BISECT_ITERS, bisect, (jnp.zeros_like(y), lb0, ub0))

    def newton(_, x):
        log_cdf, log_pdf = log_cdf_pdf(x)
        step = (log_cdf - log_y) * jnp.exp(log_cdf - log_pdf)
        return jnp.clip(x - step, lb, ub)

    return jax.lax.fori_loop(0, NEWTON_ITERS, newton, x)


def _inv_kernel(y_ref, pi_ref, mu_ref, s_ref, x_ref):
    log_pi = jax.nn.log_softmax(pi_ref[:], axis=1)
    x_ref[:] = _inv_body(y_ref[:], log_pi, mu_ref[:], s_ref[:])


def _pallas_inverse(y, pi, mu, s):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, d = y.shape
    k = pi.shape[1]
    tile_d = _pick_tile_d(d)
    grid = (bsz // TILE_B, d // tile_d)
    el = pl.BlockSpec((TILE_B, tile_d), lambda i, j: (i, j),
                      memory_space=pltpu.VMEM)
    mix = pl.BlockSpec((TILE_B, k, tile_d), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _inv_kernel,
        grid=grid,
        in_specs=[el, mix, mix, mix],
        out_specs=el,
        out_shape=jax.ShapeDtypeStruct((bsz, d), jnp.float32),
    )(y, pi, mu, s)


@jax.custom_vjp
def mixture_inverse(y, pi, mu, s):
    """Inverse mixture CDF on flattened (B, D) / (B, K, D) tensors."""
    if (jax.default_backend() == "tpu" and _pick_tile_d(y.shape[-1]) is not None
            and y.shape[0] % TILE_B == 0 and y.dtype == jnp.float32):
        return _pallas_inverse(y, pi, mu, s)
    return _inv_body(y, jax.nn.log_softmax(pi, axis=1), mu, s)


def _fwd(y, pi, mu, s):
    x = mixture_inverse(y, pi, mu, s)
    return x, (x, y, pi, mu, s)


def _bwd(res, g):
    x, y, pi, mu, s = res
    # implicit function theorem at CDF(x; theta) = y
    def cdf(x, pi, mu, s):
        return jnp.exp(logistic.mixture_log_cdf(x, pi, mu, s))

    pdf = jnp.exp(logistic.mixture_log_pdf(x, pi, mu, s))
    gx = g / pdf
    _, vjp = jax.vjp(lambda pi, mu, s: cdf(x, pi, mu, s), pi, mu, s)
    gpi, gmu, gs = vjp(-gx)
    return gx, gpi, gmu, gs


mixture_inverse.defvjp(_fwd, _bwd)
