"""Blocked Cholesky factorization as a single fused Pallas TPU kernel.

New capability (no reference equivalent): BASELINE.json north-star — "GP
post-flow regression head ... blocked Cholesky factorize/solve ... as blocked
Pallas linear algebra".

Design: the whole SPD matrix lives in VMEM for one kernel invocation
(N <= ~1024 fp32 comfortably fits the ~16MB budget); a static Python loop
walks block columns:
  1. 128x128 diagonal block factorized by an in-register right-looking
     unblocked Cholesky (fori_loop of rank-1 VPU updates);
  2. the block-column panel is formed as A21 @ inv(L11)^T where inv(L11)
     comes from an in-register forward substitution — one MXU matmul instead
     of 128 sequential column solves;
  3. the trailing Schur update A22 -= L21 @ L21^T runs on the MXU, where
     ~all the FLOPs are.
No HBM round trips between steps — XLA's own cholesky materializes
intermediate panels; this kernel keeps everything resident.

For larger N (or on CPU test backends) `cholesky_blocked` falls back to the
same blocked algorithm expressed in plain XLA ops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BLK = 128


def _unblocked_cholesky(a):
    """Right-looking Cholesky of a (b, b) SPD block, in registers."""
    b = a.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)

    def body(k, carry):
        a_cur, l_acc = carry
        pivot = jnp.sqrt(a_cur[k, k])
        col = a_cur[:, k] / pivot
        col = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (b,), 0) >= k, col, 0.0)
        col = col.at[k].set(pivot)
        # trailing rank-1 update on indices > k only
        low = col.at[k].set(0.0)
        a_new = a_cur - low[:, None] * low[None, :]
        a_cur = jnp.where(jnp.logical_and(rows > k, cols > k), a_new, a_cur)
        l_acc = l_acc.at[:, k].set(col)
        return a_cur, l_acc

    _, l = jax.lax.fori_loop(0, b, body, (a, jnp.zeros_like(a)))
    return l


def _tril_inverse(l):
    """inv(L) for lower-triangular (b, b) L via row-wise forward substitution."""
    b = l.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (b,), 0)

    def body(k, x):
        # row k of inv: (e_k - L[k, :k] @ X[:k]) / L[k, k]
        lk = jnp.where(idx < k, l[k, :], 0.0)
        row = -jnp.dot(lk, x, preferred_element_type=jnp.float32)
        row = row.at[k].add(1.0)
        return x.at[k, :].set(row / l[k, k])

    return jax.lax.fori_loop(0, b, body, jnp.zeros_like(l))


def _blocked_cholesky_body(a, n, blk, *, dot):
    """Shared blocked algorithm; `dot` supplies the matmul primitive."""
    nb = n // blk
    for j in range(nb):
        s = j * blk
        d = _unblocked_cholesky(a[s : s + blk, s : s + blk])
        a = jax.lax.dynamic_update_slice(a, d, (s, s))
        if j < nb - 1:
            d_inv = _tril_inverse(d)
            a21 = a[s + blk :, s : s + blk]
            l21 = dot(a21, d_inv.T)
            a = jax.lax.dynamic_update_slice(a, l21, (s + blk, s))
            a22 = a[s + blk :, s + blk :]
            a22 = a22 - dot(l21, l21.T)
            a = jax.lax.dynamic_update_slice(a, a22, (s + blk, s + blk))
    return a


def _mask_lower(a):
    n = a.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(rows >= cols, a, 0.0)


def _chol_kernel(a_ref, out_ref):
    n = a_ref.shape[0]
    a = a_ref[:]
    a = _blocked_cholesky_body(
        a, n, BLK,
        dot=lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32))
    out_ref[:] = _mask_lower(a)


@partial(jax.jit, static_argnames=())
def pallas_cholesky(a: jax.Array) -> jax.Array:
    """Lower-Cholesky of an SPD matrix via the fused VMEM kernel.

    Requires N % 128 == 0 (pad with an identity block otherwise — see
    `cholesky_blocked`).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a.shape[-1]
    assert n % BLK == 0, n
    return pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(flops=n**3 / 3,
                                      bytes_accessed=2 * n * n * 4,
                                      transcendentals=n),
    )(a)


def cholesky_blocked(a: jax.Array, *, use_pallas: bool | None = None) -> jax.Array:
    """Blocked Cholesky with automatic padding and backend dispatch.

    use_pallas: None = auto (TPU and N <= 1024 -> Pallas kernel; otherwise
    the identical blocked algorithm in plain XLA ops).
    """
    n = a.shape[-1]
    pad = (-n) % BLK
    if pad:
        a_p = jnp.zeros((n + pad, n + pad), a.dtype)
        a_p = a_p.at[:n, :n].set(a)
        a_p = a_p.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
        a = a_p
    m = a.shape[-1]

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu") and m <= 1024
    if use_pallas:
        l = pallas_cholesky(a)
    elif m <= BLK:
        l = _mask_lower(_unblocked_cholesky(a))
    else:
        l = _mask_lower(_blocked_cholesky_body(
            a, m, BLK,
            dot=lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)))
    return l[:n, :n] if pad else l
