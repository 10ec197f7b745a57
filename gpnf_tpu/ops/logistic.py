"""Logistic-mixture math for MixLogCDF (Flow++) couplings.

Reference: flow_modules/log_dist.py. The inverse CDF bisection (43-72) is
re-expressed as a `lax.while_loop` with the same global-convergence rule
(stop when max |x_new - x| <= 1e-10 or 100 iterations) so it is a single
compiled loop with static shapes (SURVEY.md §7.3-1).

Mixture tensors carry the component axis at dim 1: x is (B,C,H,W),
pi/mu/s are (B,K,C,H,W).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def safe_log(x):
    return jnp.log(jnp.clip(x, min=1e-22))


def _log_pdf(x, mean, log_scale):
    z = (x - mean) * jnp.exp(-log_scale)
    return z - log_scale - 2.0 * jax.nn.softplus(z)


def _log_cdf(x, mean, log_scale):
    z = (x - mean) * jnp.exp(-log_scale)
    return jax.nn.log_sigmoid(z)


def mixture_log_pdf(x, prior_logits, means, log_scales):
    log_ps = jax.nn.log_softmax(prior_logits, axis=1) + _log_pdf(
        x[:, None], means, log_scales)
    return jax.nn.logsumexp(log_ps, axis=1)


def mixture_log_cdf(x, prior_logits, means, log_scales):
    log_ps = jax.nn.log_softmax(prior_logits, axis=1) + _log_cdf(
        x[:, None], means, log_scales)
    return jax.nn.logsumexp(log_ps, axis=1)


@partial(jax.jit, static_argnames=("max_iters", "newton_iters"))
def mixture_inv_cdf(y, prior_logits, means, log_scales, eps=1e-10,
                    max_iters=100, newton_iters=4):
    """Inverse mixture CDF: bisection warm start + Newton polish.

    The reference bisects up to 100 iterations to |dx| <= 1e-10
    (log_dist.py:43-72) — 100 sequential mixture evaluations. Here ~1/3 the
    evaluations reach the same fixed point: bisection narrows the bracket,
    then Newton (using the mixture PDF, computed from the same
    intermediates) converges quadratically. y must be inside (0, 1).
    """
    log_pi = jax.nn.log_softmax(prior_logits, axis=1)

    def log_cdf_pdf(x):
        z = (x[:, None] - means) * jnp.exp(-log_scales)
        log_cdf = jax.nn.logsumexp(log_pi + jax.nn.log_sigmoid(z), axis=1)
        log_pdf = jax.nn.logsumexp(
            log_pi + z - log_scales - 2.0 * jax.nn.softplus(z), axis=1)
        return log_cdf, log_pdf

    max_scales = jnp.sum(jnp.exp(log_scales), axis=1, keepdims=True)
    lb = jnp.min(means - 20.0 * max_scales, axis=1)
    ub = jnp.max(means + 20.0 * max_scales, axis=1)
    x = jnp.zeros_like(y)

    bisect_iters = max_iters - 2 * newton_iters  # matched eval budget cap

    def cond(state):
        _, _, _, diff, i = state
        return jnp.logical_and(diff > eps, i < bisect_iters)

    def body(state):
        x, lb, ub, _, i = state
        cur_y = jnp.exp(log_cdf_pdf(x)[0])
        gt = (cur_y > y).astype(y.dtype)
        lt = 1.0 - gt
        new_x = gt * (x + lb) / 2.0 + lt * (x + ub) / 2.0
        new_lb = gt * lb + lt * x
        new_ub = gt * x + lt * ub
        diff = jnp.max(jnp.abs(new_x - x))
        # hand over to Newton once the bracket is reasonably tight
        diff = jnp.where(i >= 24, 0.0, diff)
        return new_x, new_lb, new_ub, diff, i + 1

    x, lb, ub, _, _ = jax.lax.while_loop(cond, body, (x, lb, ub, jnp.inf, 0))

    def newton(i, x):
        log_cdf, log_pdf = log_cdf_pdf(x)
        # d/dx log_cdf = exp(log_pdf - log_cdf); solve log_cdf(x) = log(y)
        step = (log_cdf - jnp.log(y)) * jnp.exp(log_cdf - log_pdf)
        return jnp.clip(x - step, lb, ub)

    return jax.lax.fori_loop(0, newton_iters, newton, x)


def logit_transform(x, reverse=False):
    """Logit (forward) / sigmoid (reverse) with element-wise |d/dx| log-det.

    Reference `inverse()` (log_dist.py:75-84): forward maps (0,1) -> R.
    """
    if reverse:
        z = jax.nn.sigmoid(x)
        ldj = jax.nn.softplus(x) + jax.nn.softplus(-x)
    else:
        z = -safe_log(1.0 / x - 1.0)
        ldj = -safe_log(x) - safe_log(1.0 - x)
    return z, ldj
