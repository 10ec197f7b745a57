"""Fused MixLogCDF forward transform (Pallas TPU).

The Flow++ coupling forward computes, per element x with K mixture params:
    u   = logsumexp_k(logpi_k + log_sigmoid((x-mu_k)/s_k))      # log CDF
    y   = (logit(exp(u)) + b) * exp(a)
    ldj = log_pdf_mix(x) + logit-ldj(exp(u)) + a
The jnp version materializes ~10 (B,K,C,H,W) intermediates in HBM
(ops/logistic.py); this kernel streams the K axis inside VMEM and writes
only y and the per-element ldj — one read of the mixture params, one write
of the outputs.

The backward pass reuses the jnp reference via custom_vjp (exact, and XLA
fuses it reasonably); the forward is the hot path in both train and eval.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import logistic

TILE_B = 8  # batch rows per program
LANES = 128


def _pick_tile_d(d: int):
    for t in (512, 384, 256, 128):
        if d % t == 0:
            return t
    return None


def _kernel(x_ref, a_ref, b_ref, pi_ref, mu_ref, s_ref, y_ref, ldj_ref):
    # blocks: x/a/b (TILE_B, TILE), pi/mu/s (TILE_B, K, TILE)
    x = x_ref[:]
    pi = pi_ref[:]
    mu = mu_ref[:]
    log_s = s_ref[:]

    log_pi = jax.nn.log_softmax(pi, axis=1)
    z = (x[:, None, :] - mu) * jnp.exp(-log_s)
    # mixture log CDF / log PDF share z
    log_cdf_k = log_pi + jax.nn.log_sigmoid(z)
    log_pdf_k = log_pi + z - log_s - 2.0 * jax.nn.softplus(z)
    log_cdf = jax.nn.logsumexp(log_cdf_k, axis=1)
    log_pdf = jax.nn.logsumexp(log_pdf_k, axis=1)

    u = jnp.exp(log_cdf)
    u_c = jnp.clip(u, 1e-22, None)
    logit_u = -jnp.log(jnp.clip(1.0 / u_c - 1.0, 1e-22, None))
    scale_ldj = -jnp.log(u_c) - jnp.log(jnp.clip(1.0 - u, 1e-22, None))

    a = a_ref[:]
    y_ref[:] = (logit_u + b_ref[:]) * jnp.exp(a)
    ldj_ref[:] = log_pdf + scale_ldj + a


def _pallas_forward(x, a, b, pi, mu, s):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, d = x.shape
    k = pi.shape[1]
    tile_d = _pick_tile_d(d)
    grid = (bsz // TILE_B, d // tile_d)
    el_spec = pl.BlockSpec((TILE_B, tile_d), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    mix_spec = pl.BlockSpec((TILE_B, k, tile_d), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
    y, ldj = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[el_spec, el_spec, el_spec, mix_spec, mix_spec, mix_spec],
        out_specs=[el_spec, el_spec],
        out_shape=[jax.ShapeDtypeStruct((bsz, d), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, d), jnp.float32)],
    )(x, a, b, pi, mu, s)
    return y, ldj


def _reference(x, a, b, pi, mu, s):
    out = jnp.exp(logistic.mixture_log_cdf(x, pi, mu, s))
    out, scale_ldj = logistic.logit_transform(out)
    y = (out + b) * jnp.exp(a)
    ldj = logistic.mixture_log_pdf(x, pi, mu, s) + scale_ldj + a
    return y, ldj


@jax.custom_vjp
def mixlogcdf_forward(x, a, b, pi, mu, s):
    """x/a/b: (B, D); pi/mu/s: (B, K, D). Returns (y, elementwise ldj)."""
    if (jax.default_backend() == "tpu" and _pick_tile_d(x.shape[-1]) is not None
            and x.shape[0] % TILE_B == 0 and x.dtype == jnp.float32):
        return _pallas_forward(x, a, b, pi, mu, s)
    return _reference(x, a, b, pi, mu, s)


def _fwd(x, a, b, pi, mu, s):
    out = mixlogcdf_forward(x, a, b, pi, mu, s)
    return out, (x, a, b, pi, mu, s)


def _bwd(res, cot):
    # exact gradients by differentiating the jnp reference (XLA fuses this
    # backward chain; only the forward is hand-fused)
    _, vjp = jax.vjp(_reference, *res)
    return vjp(cot)


mixlogcdf_forward.defvjp(_fwd, _bwd)
