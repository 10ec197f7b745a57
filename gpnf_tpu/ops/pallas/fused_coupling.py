"""Fused affine-coupling transform + log-det accumulation (Pallas TPU).

North-star kernel (BASELINE.json): "fused log-det-Jacobian accumulation".
One VMEM pass computes scale = sigmoid(raw + 2), y = shift + x * scale AND
the per-sample sum of log scale — the elementwise chain and its reduction
never round-trip to HBM separately. The backward pass is closed-form
elementwise (registered via custom_vjp), so autodiff never differentiates
through the kernel.

Used by ops/coupling.py on TPU; the jnp path remains the reference
implementation and the two are tested to agree bit-tightly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

TILE_B = 8
LANES = 128


def _fwd_kernel(x_ref, shift_ref, raw_ref, y_ref, ldj_ref):
    x = x_ref[:]
    scale = jax.nn.sigmoid(raw_ref[:] + 2.0)
    y_ref[:] = shift_ref[:] + x * scale
    ls = jnp.log(scale)
    b, d = ls.shape
    ldj_ref[:] = jnp.sum(ls.reshape(b, d // LANES, LANES), axis=1)


def _pallas_fused(x2, shift, raw):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = x2.shape
    grid = (b // TILE_B,)
    spec = pl.BlockSpec((TILE_B, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ldj_spec = pl.BlockSpec((TILE_B, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    y, ldj128 = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=[spec, ldj_spec],
        out_shape=[jax.ShapeDtypeStruct((b, d), x2.dtype),
                   jax.ShapeDtypeStruct((b, LANES), jnp.float32)],
    )(x2, shift, raw)
    return y, jnp.sum(ldj128, axis=-1)


def _reference(x2, shift, raw):
    scale = jax.nn.sigmoid(raw + 2.0)
    y = shift + x2 * scale
    return y, jnp.sum(jnp.log(scale), axis=-1)


@jax.custom_vjp
def fused_affine_forward(x2, shift, raw):
    """x2/shift/raw: (B, D) with B % 8 == 0 and D % 128 == 0 on TPU.

    Returns (y, ldj) where ldj[b] = sum_d log sigmoid(raw[b,d] + 2).
    """
    if jax.default_backend() == "tpu" and x2.shape[0] % TILE_B == 0 \
            and x2.shape[1] % LANES == 0:
        return _pallas_fused(x2, shift, raw)
    return _reference(x2, shift, raw)


def _fwd(x2, shift, raw):
    out = fused_affine_forward(x2, shift, raw)
    return out, (x2, raw)


def _bwd(res, cotangents):
    x2, raw = res
    gy, gldj = cotangents
    scale = jax.nn.sigmoid(raw + 2.0)
    one_minus = 1.0 - scale
    gx2 = gy * scale
    gshift = gy
    graw = gy * x2 * scale * one_minus + gldj[:, None] * one_minus
    return gx2, gshift, graw


fused_affine_forward.defvjp(_fwd, _bwd)
