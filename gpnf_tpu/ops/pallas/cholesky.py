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

BLK = 128


def _dot(x, y):
    return jnp.dot(x, y, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _unblocked_cholesky(a):
    """Right-looking Cholesky of a (b, b) SPD block, in registers.

    Mosaic-compatible: no value indexing with traced loop indices — element
    selection is done with one-hot masks and (b,1) matvecs, which lower to
    VPU selects and MXU ops inside Pallas kernels.
    """
    b = a.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)

    def body(k, carry):
        a_cur, l_acc = carry
        onehot = (ridx == k).astype(a.dtype)  # (b, 1) e_k
        col_k = _dot(a_cur, onehot)  # (b, 1) = a[:, k]
        akk = jnp.sum(col_k * onehot)
        pivot = jnp.sqrt(akk)
        col = jnp.where(ridx > k, col_k / pivot, 0.0)
        low = col  # strictly-below-diagonal part
        col = col + onehot * pivot
        a_cur = jnp.where(jnp.logical_and(rows > k, cols > k),
                          a_cur - _dot(low, low.T), a_cur)
        l_acc = l_acc + _dot(col, onehot.T)  # write column k
        return a_cur, l_acc

    _, l = jax.lax.fori_loop(0, b, body, (a, jnp.zeros_like(a)))
    return l


def _tril_inverse(l):
    """inv(L) for lower-triangular (b, b) L via row-wise forward substitution
    (same Mosaic-compatible one-hot formulation)."""
    b = l.shape[0]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def body(k, x):
        onehot = (ridx == k).astype(l.dtype)  # (b, 1)
        l_row = _dot(onehot.T, l)  # (1, b) = L[k, :]
        lkk = jnp.sum(l_row * onehot.T)
        lk = jnp.where(cidx < k, l_row, 0.0)
        row = (onehot.T - _dot(lk, x)) / lkk  # (1, b)
        return x + _dot(onehot, row)  # write row k

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
    """In-place blocked factorization on the VMEM output ref. All block
    indices are static Python ints, so every ref access is a static slice
    (Mosaic lowers those; value-level dynamic_update_slice it does not)."""
    n = a_ref.shape[0]
    nb = n // BLK
    out_ref[:] = a_ref[:]
    for j in range(nb):
        s = j * BLK
        d = _unblocked_cholesky(out_ref[s : s + BLK, s : s + BLK])
        out_ref[s : s + BLK, s : s + BLK] = d
        if j < nb - 1:
            d_inv = _tril_inverse(d)
            a21 = out_ref[s + BLK :, s : s + BLK]
            l21 = _dot(a21, d_inv.T)
            out_ref[s + BLK :, s : s + BLK] = l21
            a22 = out_ref[s + BLK :, s + BLK :]
            out_ref[s + BLK :, s + BLK :] = a22 - _dot(l21, l21.T)
    out_ref[:] = _mask_lower(out_ref[:])


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
        cost_estimate=pl.CostEstimate(flops=n**3 // 3,
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
        l = _mask_lower(_blocked_cholesky_body(a, m, BLK, dot=_dot))
    return l[:n, :n] if pad else l
