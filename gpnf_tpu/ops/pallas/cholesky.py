"""Blocked Cholesky factorization as a single fused Pallas TPU kernel.

New capability (no reference equivalent): BASELINE.json north-star — "GP
post-flow regression head ... blocked Cholesky factorize/solve ... as blocked
Pallas linear algebra".

Design: the whole SPD matrix lives in VMEM for one kernel invocation
(N <= ~1024 fp32 comfortably fits the ~16MB budget); a static Python loop
walks block columns of width BLK:
  1. the full (m, BLK) PANEL (diagonal block + everything below) is
     factorized by a right-looking scalar loop of rank-1 VPU updates — the
     classic LAPACK panel step. Doing the panel in one loop removes the
     separate triangular inverse + MXU panel solve an earlier version used
     (two sequential O(BLK) loops and per-iteration MXU matvecs made it
     2.5x slower than XLA's native cholesky);
  2. the trailing Schur update A22 -= L21 @ L21^T runs on the MXU, where
     ~all the FLOPs are.
No HBM round trips between steps — XLA's own cholesky materializes
intermediate panels; this kernel keeps everything resident.

All value selection inside the scalar loop uses iota masks + reductions
(pure VPU); Mosaic does not lower value-level dynamic_slice with traced
indices.

Differentiation: `cholesky_blocked` carries the standard two-triangular-solve
custom VJP, matching jax's native cholesky gradient, so the factorization can
sit in the GP marginal-likelihood autodiff path on any backend.

For CPU test backends `cholesky_blocked` falls back to the same blocked
algorithm expressed in plain XLA ops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BLK = 128


def _dot(x, y):
    return jnp.dot(x, y, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _panel_cholesky(p):
    """Right-looking factorization of an (m, b) block-column panel whose top
    b x b block is the (symmetric) diagonal block.

    Column k of the result is the k-th Cholesky column restricted to the
    panel; entries above the global diagonal are zeroed by the caller's mask.
    One rank-1 VPU update per column; no MXU ops, no triangular inverse.
    """
    m, b = p.shape
    ridx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def body(k, p):
        colmask = cidx == k  # (1, b)
        col = jnp.sum(jnp.where(colmask, p, 0.0), axis=1, keepdims=True)  # (m,1)
        akk = jnp.sum(jnp.where(ridx == k, col, 0.0))
        pivot = jnp.sqrt(akk)
        inv = 1.0 / pivot
        col_l = jnp.where(ridx > k, col * inv, 0.0)  # strictly below diag row
        # row k of the (still symmetric) top block, scaled: the L^T row used
        # by the rank-1 update. Extracted by reduction — the top b x b block
        # stays symmetric under these symmetric rank-1 updates.
        rowk = jnp.sum(jnp.where(ridx == k, p, 0.0), axis=0, keepdims=True)
        row_l = jnp.where(cidx > k, rowk * inv, 0.0)  # (1, b)
        p = p - col_l * row_l  # rank-1; zero outside (rows>k, cols>k)
        lcol = col_l + jnp.where(ridx == k, pivot, 0.0)
        return jnp.where(colmask, lcol, p)

    return jax.lax.fori_loop(0, b, body, p)


def _mask_lower(a):
    n = a.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(rows >= cols, a, 0.0)


def _panel_mask(m, b, dtype):
    """(m, b) mask keeping on/below the diagonal of the top b x b block."""
    ridx = jax.lax.broadcasted_iota(jnp.int32, (m, b), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (m, b), 1)
    return (ridx >= cidx).astype(dtype)


def _chol_kernel(a_ref, out_ref):
    """In-place blocked factorization on the VMEM output ref. All block
    indices are static Python ints, so every ref access is a static slice
    (Mosaic lowers those; value-level dynamic_update_slice it does not)."""
    n = a_ref.shape[0]
    nb = n // BLK
    out_ref[:] = a_ref[:]
    for j in range(nb):
        s = j * BLK
        panel = _panel_cholesky(out_ref[s:, s : s + BLK])
        panel = panel * _panel_mask(n - s, BLK, panel.dtype)
        out_ref[s:, s : s + BLK] = panel
        if j < nb - 1:
            l21 = panel[BLK:]
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


# --------------------------------------------------------------------------
# HBM-streaming left-looking Cholesky (n = 2k .. 16k)
# --------------------------------------------------------------------------
def _hbm_panel_width(n: int) -> int:
    """Panel width P sized so panel (n,P) + double-buffered column stream
    (2,n,P) stay ~12 MB of VMEM."""
    if n <= 4096:
        return 256
    if n <= 8192:
        return 128
    return 64


def _hbm_chol_kernel(a_hbm, out_hbm, panel, diag, kcol, krow,
                     sem_p, sem_d, sem_kc, sem_kr, sem_s, *, n, P, T):
    """Left-looking panel factorization, matrix resident in HBM.

    Per block column j (all offsets traced, all DMA sizes static):
      1. DMA block column j of A (full height) + its diagonal block to VMEM;
      2. stream previously factorized columns k<j back from HBM
         (double-buffered DMA overlapped with compute) and apply the
         left-looking update  panel -= L[:,k] @ L[row j,k]^T  on the MXU,
         row-tiled with @pl.when so tiles fully above the diagonal are
         skipped (~halves the junk-row FLOPs);
      3. factorize the P x P diagonal block with the rank-1 VPU loop, invert
         it exactly by Newton doubling (trisolve.py), and form the
         below-diagonal block as ONE MXU matmul  panel @ L11^{-T}  — the
         LAPACK sub-panel trick that keeps the sequential scalar work at
         O(n P^2) instead of O(n^2 P);
      4. DMA the masked column + L11 back to HBM.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .trisolve import _newton_tril_inv

    nb = n // P
    tile = n // T
    ridx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def col_step(j, carry):
        s = j * P
        pltpu.make_async_copy(a_hbm.at[:, pl.ds(s, P)], panel, sem_p).start()
        pltpu.make_async_copy(a_hbm.at[pl.ds(s, P), pl.ds(s, P)], diag,
                              sem_d).start()
        pltpu.make_async_copy(a_hbm.at[:, pl.ds(s, P)], panel, sem_p).wait()
        pltpu.make_async_copy(a_hbm.at[pl.ds(s, P), pl.ds(s, P)], diag,
                              sem_d).wait()

        def k_dmas(k, slot):
            return (
                pltpu.make_async_copy(out_hbm.at[:, pl.ds(k * P, P)],
                                      kcol.at[slot], sem_kc.at[slot]),
                pltpu.make_async_copy(
                    out_hbm.at[pl.ds(s, P), pl.ds(k * P, P)],
                    krow.at[slot], sem_kr.at[slot]),
            )

        @pl.when(j > 0)
        def _():
            for dma in k_dmas(0, 0):
                dma.start()

        def k_body(k, _):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < j)
            def _():
                for dma in k_dmas(k + 1, jax.lax.rem(k + 1, 2)):
                    dma.start()

            for dma in k_dmas(k, slot):
                dma.wait()
            # slot selection via cond keeps every ref read a STATIC slice
            # (Mosaic does not lower value reads at traced leading indices)
            kr = jax.lax.cond(slot == 0, lambda: krow[0], lambda: krow[1])
            diag[:] = diag[:] - _dot(kr, kr.T)
            for t in range(T):
                lo = t * tile

                @pl.when(lo + tile > s)
                def _():
                    upd = jax.lax.cond(
                        slot == 0,
                        lambda: _dot(kcol[0, lo:lo + tile, :], kr.T),
                        lambda: _dot(kcol[1, lo:lo + tile, :], kr.T))
                    panel[lo:lo + tile, :] = panel[lo:lo + tile, :] - upd
            return 0

        jax.lax.fori_loop(0, j, k_body, 0)

        l11 = _panel_cholesky(diag[:]) * _panel_mask(P, P, diag.dtype)
        inv = _newton_tril_inv(l11)
        diag[:] = l11
        for t in range(T):
            lo = t * tile

            @pl.when(lo + tile > s)
            def _():
                below = _dot(panel[lo:lo + tile, :], inv.T)
                rmask = (ridx[lo:lo + tile] >= s + P).astype(below.dtype)
                panel[lo:lo + tile, :] = below * rmask

            @pl.when(lo + tile <= s)
            def _():
                panel[lo:lo + tile, :] = jnp.zeros((tile, P), panel.dtype)

        pltpu.make_async_copy(panel, out_hbm.at[:, pl.ds(s, P)], sem_s).start()
        pltpu.make_async_copy(panel, out_hbm.at[:, pl.ds(s, P)], sem_s).wait()
        pltpu.make_async_copy(diag, out_hbm.at[pl.ds(s, P), pl.ds(s, P)],
                              sem_d).start()
        pltpu.make_async_copy(diag, out_hbm.at[pl.ds(s, P), pl.ds(s, P)],
                              sem_d).wait()
        return carry

    jax.lax.fori_loop(0, nb, col_step, 0)


@partial(jax.jit, static_argnames=("panel_width", "interpret"))
def pallas_cholesky_hbm(a: jax.Array, *, panel_width: int | None = None,
                        interpret: bool = False) -> jax.Array:
    """Lower-Cholesky with the matrix streamed from HBM (n = 2k..16k).

    Requires n % P == 0 for the auto panel width P (256/128/64 by n) — use
    `cholesky_blocked`, which pads, as the front end. `panel_width` and
    `interpret` exist for small-shape interpreter-mode tests.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a.shape[-1]
    P = panel_width or _hbm_panel_width(n)
    T = 8
    assert n % P == 0 and (n // T) % 8 == 0, (n, P)
    return pl.pallas_call(
        partial(_hbm_chol_kernel, n=n, P=P, T=T),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((n, P), a.dtype),       # panel
            pltpu.VMEM((P, P), a.dtype),       # diagonal block
            pltpu.VMEM((2, n, P), a.dtype),    # streamed k columns (2 slots)
            pltpu.VMEM((2, P, P), a.dtype),    # streamed k diag rows
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(flops=n**3,
                                      bytes_accessed=n**3 // P * 4,
                                      transcendentals=n),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(a)


def _blocked_cholesky_xla(a):
    """Same blocked panel algorithm in plain XLA ops (CPU fallback)."""
    n = a.shape[0]
    nb = n // BLK
    for j in range(nb):
        s = j * BLK
        panel = _panel_cholesky(jax.lax.dynamic_slice(
            a, (s, s), (n - s, BLK)))
        panel = panel * _panel_mask(n - s, BLK, panel.dtype)
        a = jax.lax.dynamic_update_slice(a, panel, (s, s))
        if j < nb - 1:
            l21 = panel[BLK:]
            a22 = a[s + BLK :, s + BLK :]
            a = jax.lax.dynamic_update_slice(a, a22 - _dot(l21, l21.T),
                                             (s + BLK, s + BLK))
    return _mask_lower(a)


def _phi(x):
    """tril with halved diagonal — the Cholesky-VJP projection."""
    return jnp.tril(x) - 0.5 * jnp.diag(jnp.diagonal(x))


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _chol_core(a, kind: str):
    if kind == "pallas":
        return pallas_cholesky(a)
    if kind == "hbm":
        return pallas_cholesky_hbm(a)
    if kind == "native":
        return jnp.linalg.cholesky(a)
    return _blocked_cholesky_xla(a)


def _chol_fwd(a, kind):
    l = _chol_core(a, kind)
    return l, l


def _chol_bwd(kind, l, l_bar):
    """Standard Cholesky reverse rule (two triangular solves):
    A_bar = L^{-T} . phi(L^T L_bar) . L^{-1}, symmetrized the same way
    jax.lax.linalg.cholesky's own rule is (so grads through either
    implementation agree). Solves go through the blocked tril_solve
    dispatcher — XLA's native triangular_solve is a scalar while-loop on
    TPU, unusable at GP-head sizes (n >= 2048)."""
    del kind
    from .trisolve import tril_solve

    w = _phi(jnp.matmul(l.T, l_bar, precision=jax.lax.Precision.HIGHEST))
    # t = L^{-T} w ; a_bar = t L^{-1} = (L^{-T} t^T)^T
    t = tril_solve(l, w, trans=True)
    a_bar = tril_solve(l, t.T, trans=True).T
    a_bar = 0.5 * (a_bar + a_bar.T)
    return (a_bar,)


_chol_core.defvjp(_chol_fwd, _chol_bwd)


def cholesky_blocked(a: jax.Array, *, use_pallas: bool | None = None) -> jax.Array:
    """Blocked Cholesky with automatic padding and backend dispatch.

    use_pallas: True forces a fused Pallas kernel (the VMEM-resident one for
    n < 2048, the HBM-streaming `pallas_cholesky_hbm` at n >= 2048); None =
    auto picks the fastest measured option per backend — on TPU, XLA's
    NATIVE cholesky below n=2048 (the VMEM kernel's sequential pivot chain
    is ~1.9x slower at n=1024, docs/BENCHMARKS.md) and the HBM-streaming
    kernel at n >= 2048 (left-looking MXU panels; crossover measured in
    docs/BENCHMARKS.md); the blocked jnp algorithm on CPU. Every path
    carries the two-triangular-solve custom VJP, so `gp.fit` differentiates
    through the factorization with O(n^3) solves instead of unrolled-loop
    autodiff.
    """
    n = a.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    hbm = (use_pallas or use_pallas is None) and on_tpu and n >= 2048
    blk = _hbm_panel_width(n) if hbm else BLK
    pad = (-n) % blk
    if pad:
        a_p = jnp.zeros((n + pad, n + pad), a.dtype)
        a_p = a_p.at[:n, :n].set(a)
        a_p = a_p.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
        a = a_p

    if hbm:
        kind = "hbm"
    elif use_pallas:
        kind = "pallas"
    elif on_tpu:
        kind = "native"
    else:
        kind = "xla"
    l = _chol_core(a, kind)
    return l[:n, :n] if pad else l
