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
# diagonal-block factorization flavor inside kernels: dynamic-row-slice
# in-place loop (True) vs masked-reduction value loop (False). A/B'd on TPU
# (docs/BENCHMARKS.md); module-level so benches can flip it per-trace.
DIAG_REF_SLICE = True


def _dot(x, y, precision=None):
    # fp32 accumulation on TPU; float64 operands (the CPU fp64 verification
    # path, tests/test_flow_gp.py) keep their own dtype
    acc = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    return jnp.dot(x, y, preferred_element_type=acc,
                   precision=precision or jax.lax.Precision.HIGHEST)


def _dot_bf16x3(x, y):
    """3-pass bf16x3 fp32-accurate-ish dot: hi/lo split each operand into
    bf16 halves, drop the lo*lo term (~2^-16 relative). Mosaic rejects
    Precision.HIGH inside kernels, so the expansion is explicit; each term
    is a single-pass bf16 MXU dot with fp32 accumulation — 3 passes total
    vs HIGHEST's 6."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    yh = y.astype(jnp.bfloat16)
    yl = (y - yh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return d(xh, yh) + d(xh, yl) + d(xl, yh)


def _panel_cholesky(p):
    """Right-looking factorization of an (m, b) block-column panel whose top
    b x b block is the (symmetric) diagonal block.

    Column k of the result is the k-th Cholesky column restricted to the
    panel; entries above the global diagonal are zeroed by the caller's mask.

    Columns advance in PAIRS (a fused rank-2 pivot: the closed-form 2x2
    Cholesky of the pivot block + one combined two-term update), which
    halves the sequential-loop fixed costs — masked-reduction extractions
    and full-panel passes — that dominate this loop on the VPU. The fused
    pair is algebraically exactly two consecutive rank-1 steps. No MXU ops,
    no triangular inverse.
    """
    m, b = p.shape
    assert b % 2 == 0, b
    ridx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def body(i, p):
        k = 2 * i
        m0 = cidx == k
        m1 = cidx == k + 1
        c0 = jnp.sum(jnp.where(m0, p, 0.0), axis=1, keepdims=True)  # (m,1)
        c1 = jnp.sum(jnp.where(m1, p, 0.0), axis=1, keepdims=True)
        rk0 = ridx == k
        rk1 = ridx == k + 1
        a = jnp.sum(jnp.where(rk0, c0, 0.0))    # pivot block [[a, bb],
        bb = jnp.sum(jnp.where(rk1, c0, 0.0))   #              [bb, cc]]
        cc = jnp.sum(jnp.where(rk1, c1, 0.0))
        p0 = jnp.sqrt(a)
        i0 = 1.0 / p0
        l0 = jnp.where(ridx > k, c0 * i0, 0.0)           # L column k, below
        r0 = jnp.sum(jnp.where(rk0, p, 0.0), axis=0, keepdims=True)
        u0 = jnp.where(cidx > k, r0 * i0, 0.0)           # L^T row k
        u0k1 = bb * i0                                   # L[k+1, k]
        c1p = c1 - l0 * u0k1                             # col k+1 after step 1
        p1 = jnp.sqrt(cc - u0k1 * u0k1)
        i1 = 1.0 / p1
        l1 = jnp.where(ridx > k + 1, c1p * i1, 0.0)      # L column k+1, below
        r1 = jnp.sum(jnp.where(rk1, p, 0.0), axis=0, keepdims=True)
        u1 = jnp.where(cidx > k + 1, (r1 - u0k1 * u0) * i1, 0.0)
        p = p - l0 * u0 - l1 * u1                        # fused rank-2
        lcol0 = l0 + jnp.where(rk0, p0, 0.0)
        lcol1 = l1 + jnp.where(rk1, p1, 0.0)
        return jnp.where(m0, lcol0, jnp.where(m1, lcol1, p))

    return jax.lax.fori_loop(0, b // 2, body, p)


def _chol_sym_inplace(scr):
    """In-place Cholesky of the symmetric (b, b) block held in the VMEM
    scratch ref `scr`; on return scr holds U = L^T exactly (zeros below the
    diagonal included).

    Row k of the (still symmetric) trailing block IS column k, and Mosaic
    lowers dynamic SUBLANE slices of refs (`ref[pl.ds(k, 1), :]`) with
    traced k — so each pivot row is one 1-row load instead of a full-panel
    masked reduction, and all per-column vector work happens on (1, b)
    rows. The rank-2 trailing update is one thin MXU matmul
    (b, 2) @ (2, b). This cuts the full-panel VPU passes per column from
    ~6 to ~1, which is the sequential floor of the whole factorization.
    """
    import jax.experimental.pallas as pl

    b = scr.shape[0]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def body(i, carry):
        k = 2 * i
        mk0 = cidx == k
        mk1 = cidx == k + 1
        u0raw = scr[pl.ds(k, 1), :]                     # (1, b) row k
        u1raw = scr[pl.ds(k + 1, 1), :]
        a = jnp.sum(jnp.where(mk0, u0raw, 0.0))
        bb = jnp.sum(jnp.where(mk0, u1raw, 0.0))        # d[k+1, k]
        cc = jnp.sum(jnp.where(mk1, u1raw, 0.0))
        p0 = jnp.sqrt(a)
        i0 = 1.0 / p0
        u0 = jnp.where(cidx > k, u0raw * i0, 0.0)       # L^T row k, past diag
        u0k1 = bb * i0                                  # L[k+1, k]
        p1 = jnp.sqrt(cc - u0k1 * u0k1)
        i1 = 1.0 / p1
        u1 = jnp.where(cidx > k + 1, (u1raw - u0k1 * u0) * i1, 0.0)
        uu = jnp.concatenate([u0, u1], axis=0)          # (2, b)
        scr[:] = scr[:] - _dot(uu.T, uu)                # fused rank-2, MXU
        scr[pl.ds(k, 1), :] = u0 + jnp.where(mk0, p0, 0.0)
        scr[pl.ds(k + 1, 1), :] = u1 + jnp.where(mk1, p1, 0.0)
        return carry

    jax.lax.fori_loop(0, b // 2, body, 0, unroll=False)


def _diag_chol_blocked(d, scr=None, sub: int = 128):
    """Lower-Cholesky of a (P, P) symmetric VALUE via `sub`-wide panels.

    The sequential scalar loop only ever factorizes a (sub, sub) diagonal
    block — the below-diagonal rows of each panel come from one MXU
    Newton-inverse solve, and the trailing coupling is one MXU Schur
    update. With a (sub, sub) VMEM scratch ref `scr` (kernel callers), the
    diagonal factorization runs as the in-place dynamic-row-slice loop
    (`_chol_sym_inplace`); without one (plain-XLA callers) it falls back to
    the masked-reduction panel loop. All offsets static — safe inside a
    Mosaic kernel body.
    """
    from .trisolve import _newton_tril_inv

    def chol_sub(block):
        b = block.shape[0]
        if scr is None or scr.shape[0] != b or not DIAG_REF_SLICE:
            return _panel_cholesky(block) * _panel_mask(b, b, block.dtype)
        scr[:] = block
        _chol_sym_inplace(scr)
        return scr[:].T

    p = d.shape[0]
    if p <= sub:
        return chol_sub(d)
    cols = []
    trail = d
    for q in range(p // sub):
        o = q * sub
        m = p - o
        l11 = chol_sub(trail[:sub, :sub])
        if m > sub:
            l21 = _dot(trail[sub:, :sub], _newton_tril_inv(l11).T)
            pan = jnp.concatenate([l11, l21], axis=0)
        else:
            pan = l11
        if o:
            pan = jnp.concatenate(
                [jnp.zeros((o, sub), d.dtype), pan], axis=0)
        cols.append(pan)
        if m > sub:
            trail = trail[sub:, sub:] - _dot(l21, l21.T)
    return jnp.concatenate(cols, axis=1)


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


def _chol_kernel(a_ref, out_ref, dscr):
    """In-place blocked factorization on the VMEM output ref. All block
    indices are static Python ints, so every ref access is a static slice
    (Mosaic lowers those; value-level dynamic_update_slice it does not).

    The scalar rank-1 loop only ever touches the (BLK, BLK) diagonal block;
    the below-diagonal part of each panel comes from the Newton-inverse MXU
    solve and the trailing update is one MXU matmul — per-column scalar work
    stays O(BLK^2) instead of O(n*BLK)."""
    from .trisolve import _newton_tril_inv

    n = a_ref.shape[0]
    nb = n // BLK
    out_ref[:] = a_ref[:]
    for j in range(nb):
        s = j * BLK
        l11 = _diag_chol_blocked(out_ref[s : s + BLK, s : s + BLK], dscr)
        out_ref[s : s + BLK, s : s + BLK] = l11
        if j < nb - 1:
            inv = _newton_tril_inv(l11)
            l21 = _dot(out_ref[s + BLK :, s : s + BLK], inv.T)
            out_ref[s + BLK :, s : s + BLK] = l21
            a22 = out_ref[s + BLK :, s + BLK :]
            out_ref[s + BLK :, s + BLK :] = a22 - _dot(l21, l21.T)
    out_ref[:] = _mask_lower(out_ref[:])


@partial(jax.jit, static_argnames=())
def pallas_cholesky(a: jax.Array) -> jax.Array:
    """Lower-Cholesky of an SPD matrix via the fused VMEM kernel.

    Requires N % 128 == 0 (pad with an identity block otherwise — see
    `cholesky_blocked`). Up to n = 2048 the whole matrix stays resident:
    in+out+dot temporaries at 2048 need ~48 MB of scoped VMEM, inside the
    raised 100 MB budget (v5e physical VMEM is 128 MB; the 16 MB default is
    just XLA's conservative scoping default).
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
        scratch_shapes=[pltpu.VMEM((BLK, BLK), a.dtype)],
        cost_estimate=pl.CostEstimate(flops=n**3 // 3,
                                      bytes_accessed=2 * n * n * 4,
                                      transcendentals=n),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a)


# --------------------------------------------------------------------------
# HBM-streaming left-looking Cholesky (n = 2k .. 16k)
# --------------------------------------------------------------------------
def _hbm_panel_width(n: int) -> int:
    """Panel width P sized so panel (n,P) + double-buffered column stream
    (2,n,P) + the HIGHEST-precision dot temporaries (~2-3x nP more) stay
    inside the raised 64 MB scoped-VMEM budget (vmem_limit_bytes below;
    v5e physical VMEM is 128 MB)."""
    if n <= 4096:
        return 256
    if n <= 8192:
        return 128
    return 64


def _hbm_chol_kernel(a_hbm, out_hbm, panel, kcol, dscr, sem_p, sem_k, sem_s,
                     *, n, P, trailing_precision="highest"):
    """Left-looking panel factorization, matrix resident in HBM.

    The block-column loop j is a STATIC Python loop (nb is known at trace
    time), which makes every row offset static. That buys, per streamed
    column k < j:
      - an exact-height DMA — only rows [s:n] of column k move (the rows the
        update touches), not the full column;
      - ONE MXU dot — the L[s:s+P, k]^T factor is rows [0:P] of the streamed
        block, so the diagonal-block update folds into the same matmul
        (no separate diag scratch, krow DMA, or row-tile predication);
      - static DMA slots — the k loop advances in PAIRS (slot 0 = even k,
        slot 1 = odd k, one-pair-ahead prefetch), so there is no
        lax.cond slot select (which reads BOTH buffers) anywhere.
    After the k sweep: factorize the P x P diagonal block with the rank-1
    VPU loop, invert it exactly by Newton doubling (trisolve.py), and form
    the below-diagonal block as ONE MXU matmul  panel @ L11^{-T}  — the
    LAPACK sub-panel trick that keeps the sequential scalar work at
    O(n P^2) instead of O(n^2 P). The strict upper triangle of the output
    is zeroed by the caller (jnp.tril) — cheaper as one fused XLA pass than
    as per-column zero DMAs.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .trisolve import _newton_tril_inv

    nb = n // P

    for j in range(nb):
        s = j * P
        m = n - s
        cp = pltpu.make_async_copy(a_hbm.at[pl.ds(s, m), pl.ds(s, P)],
                                   panel.at[pl.ds(0, m)], sem_p)
        cp.start()
        cp.wait()

        def k_dma(k, slot, s=s, m=m):
            # rows [s:n] of factorized column k (row range static per j)
            return pltpu.make_async_copy(
                out_hbm.at[pl.ds(s, m), pl.ds(k * P, P)],
                kcol.at[slot, pl.ds(0, m)], sem_k.at[slot])

        def apply(slot, s=s, m=m):
            # one dot updates the diag block AND everything below it:
            # kr = L[s:s+P, k]^T is rows [0:P] of the streamed block
            kr = kcol[slot, 0:P, :]
            # the trailing/Schur GEMM — the O(n^3/3) bulk. HIGHEST = 6
            # bf16 MXU passes (exact fp32); "high" = 3 passes (bf16x3,
            # ~1e-6 relative) at 2x the MXU rate. The panel factorization
            # and solve below always stay HIGHEST: their error enters L
            # directly rather than averaging out over the sum.
            if trailing_precision == "high":
                upd = _dot_bf16x3(kcol[slot, 0:m, :], kr.T)
            else:
                upd = _dot(kcol[slot, 0:m, :], kr.T)
            panel[0:m, :] = panel[0:m, :] - upd

        if j > 0:
            k_dma(0, 0).start()
        if j > 1:
            k_dma(1, 1).start()

        def pair_body(i, _, j=j):
            k0 = 2 * i

            k_dma(k0, 0).wait()
            apply(0)

            @pl.when(k0 + 2 < j)
            def _():
                k_dma(k0 + 2, 0).start()

            @pl.when(k0 + 1 < j)
            def _():
                k_dma(k0 + 1, 1).wait()
                apply(1)

            @pl.when(k0 + 3 < j)
            def _():
                k_dma(k0 + 3, 1).start()

            return 0

        if j > 0:
            jax.lax.fori_loop(0, (j + 1) // 2, pair_body, 0)

        l11 = _diag_chol_blocked(panel[0:P, :], dscr)
        inv = _newton_tril_inv(l11)
        panel[0:P, :] = l11
        if m > P:
            panel[P:m, :] = _dot(panel[P:m, :], inv.T)

        cp = pltpu.make_async_copy(panel.at[pl.ds(0, m)],
                                   out_hbm.at[pl.ds(s, m), pl.ds(s, P)],
                                   sem_s)
        cp.start()
        cp.wait()


@partial(jax.jit, static_argnames=("panel_width", "interpret",
                                   "trailing_precision"))
def pallas_cholesky_hbm(a: jax.Array, *, panel_width: int | None = None,
                        interpret: bool = False,
                        trailing_precision: str = "highest") -> jax.Array:
    """Lower-Cholesky with the matrix streamed from HBM (n = 2k..16k).

    Requires n % P == 0 for the auto panel width P (256/128/64 by n) — use
    `cholesky_blocked`, which pads, as the front end. `panel_width` and
    `interpret` exist for small-shape interpreter-mode tests.

    trailing_precision="high" runs the left-looking trailing GEMMs as
    3-pass bf16x3 (2x MXU rate vs the 6-pass exact-fp32 HIGHEST) while the
    panel factorization/solve stay HIGHEST — the mixed-precision mode for
    the n>=4096 regime where the trailing GEMM dominates; expect ~1e-6
    relative residual growth (measured by scripts/bench_cholesky.py).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a.shape[-1]
    P = panel_width or _hbm_panel_width(n)
    assert n % P == 0, (n, P)
    l = pl.pallas_call(
        partial(_hbm_chol_kernel, n=n, P=P,
                trailing_precision=trailing_precision),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n, P), a.dtype),       # panel
            pltpu.VMEM((2, n, P), a.dtype),    # streamed k columns (2 slots)
            pltpu.VMEM((128, 128), a.dtype),   # diag-chol working block
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(flops=n**3 // 3,
                                      bytes_accessed=n**3 // (2 * P) * 4,
                                      transcendentals=n),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(a)
    # the kernel writes only rows >= the block-column start; the strict
    # upper triangle keeps whatever HBM held — zero it in one fused pass.
    return jnp.tril(l)


@jax.jit
def _xl_head(a):
    h = a.shape[-1] // 2
    return a[:h, :h]


@jax.jit
def _xl_tail(a, l11):
    """L21 = (L11^{-1} A21^T)^T via the rolled blocked solve, plus the Schur
    complement A22 - L21 L21^T — one jitted program (no Pallas inside, so
    the compile payload stays small)."""
    from .trisolve import _xla_tril_solve_loop

    h = l11.shape[-1]
    l21 = _xla_tril_solve_loop(l11, a[h:, :h].T, trans=False).T
    schur = a[h:, h:] - jnp.matmul(l21, l21.T,
                                   precision=jax.lax.Precision.HIGHEST)
    return l21, schur


@jax.jit
def _xl_assemble(l11, l21, l22):
    h, n = l11.shape[-1], l11.shape[-1] + l22.shape[-1]
    top = jnp.concatenate([l11, jnp.zeros((h, n - h), l11.dtype)], axis=1)
    return jnp.concatenate([top, jnp.concatenate([l21, l22], axis=1)], axis=0)


def _chol_recursive_tpu(a: jax.Array) -> jax.Array:
    """Half-splitting recursion for n > 4096:
        chol([[A11, .], [A21, A22]]) = [[L11, 0], [L21, L22]]
    with L11 = chol(A11), L21 = A21 L11^{-T} (rolled blocked triangular
    solve) and L22 = chol(A22 - L21 L21^T). Leaves go to
    `pallas_cholesky_hbm`; the solve + Schur GEMM carry the FLOPs bulk on
    big MXU matmuls.

    HOST-LEVEL recursion: each piece is its own jitted dispatch (5 per
    level, async-pipelined). Inlining two 4096 Pallas leaves into one
    program exceeds the remote-compile payload limit (HTTP 413 measured at
    n=8192), so this function must be called EAGERLY for n > 4096 —
    `cholesky_blocked` falls back to XLA native when tracing at that size."""
    n = a.shape[-1]
    if n <= 4096:
        return pallas_cholesky_hbm(a)
    l11 = _chol_recursive_tpu(_xl_head(a))
    l21, schur = _xl_tail(a, l11)
    l22 = _chol_recursive_tpu(schur)
    return _xl_assemble(l11, l21, l22)


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
        return _chol_recursive_tpu(a)
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
    n < 2048, the HBM-streaming `pallas_cholesky_hbm` / host-level
    recursion at n >= 2048, eager-only above 4096 — remote-compile payload
    limit); None = auto picks the fastest measured option per backend — on
    TPU, the Pallas HBM kernel only at 2048 <= n < 3072 (19% over XLA
    native at n=2048, readback-protocol A/B in docs/BENCHMARKS.md) and
    XLA's NATIVE cholesky everywhere else (its column expander wins by
    ~1.3-1.4x at n >= 4096); the blocked jnp algorithm on CPU.
    Every path carries the two-triangular-solve custom VJP, so `gp.fit`
    differentiates through the factorization with O(n^3) solves instead of
    unrolled-loop autodiff.
    """
    import jax.core

    n = a.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    tracing = isinstance(a, jax.core.Tracer)
    want_pallas = use_pallas or use_pallas is None
    if on_tpu and want_pallas and 2048 <= n < 3072:
        hbm = True       # HBM kernel beats XLA native here (19% at n=2048,
        #                  readback-protocol A/B in docs/BENCHMARKS.md)
    elif on_tpu and bool(use_pallas) and n >= 3072 and not (
            tracing and n > 4096):
        hbm = True       # forced; host-level recursion above 4096 is
        #                  eager-only (remote-compile payload limit)
    else:
        hbm = False
    blk = (1024 if n > 4096 else _hbm_panel_width(n)) if hbm else BLK
    pad = (-n) % blk
    if pad:
        a_p = jnp.zeros((n + pad, n + pad), a.dtype)
        a_p = a_p.at[:n, :n].set(a)
        a_p = a_p.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
        a = a_p

    if hbm:
        kind = "hbm"
    elif use_pallas and on_tpu:
        kind = "pallas" if n < 2048 else "native"
    elif use_pallas:
        kind = "xla"
    elif on_tpu:
        kind = "native"
    else:
        kind = "xla"
    l = _chol_core(a, kind)
    return l[:n, :n] if pad else l
