"""Fused multi-head attention kernel for the Flow++ coupling networks.

The GatedAttn block (ops/mixlogcdf.py) materializes (B, H, S, S) weight
tensors plus a same-shaped dropout mask in HBM; at CIFAR level 1 that is
67M elements per block, ~10x per coupling — measured as the dominant cost
of the training step (docs/BENCHMARKS.md). S <= 256 here, so the whole
score matrix for one (batch, all-heads) slice fits VMEM: this kernel fuses
scores -> softmax -> dropout -> @V in one pass, with dropout bits generated
in-kernel (pltpu.prng_*) and regenerated identically in the backward kernel,
so no mask ever touches HBM.

Backward (custom_vjp): standard attention gradients with the dropout mask
re-derived from the same per-program seed:
    P = softmax(S);  Pd = drop(P)
    dV = Pd^T g;  dPd = g V^T;  dP = mask*dPd/(1-r)
    dS = P * (dP - rowsum(dP * P));  dQ = dS K;  dK = dS^T Q
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_S = 512  # VMEM budget guard: S*S*H fp32 scores per program


def _softmax_last(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dropout_keep(shape, rate):
    """uint32 threshold mask from the already-seeded in-kernel PRNG."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return bits >= threshold


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = q_ref[0]  # (H, S, Dh)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = _softmax_last(s)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropout_keep(p.shape, rate)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = _softmax_last(s)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropout_keep(p.shape, rate)
        pd = jnp.where(keep, p / (1.0 - rate), 0.0)
    else:
        pd = p
    # dV = Pd^T g : (H, S, S)^T x (H, S, Dh)
    dv = jax.lax.dot_general(pd, g, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    # dPd = g V^T
    dpd = jax.lax.dot_general(g, v.astype(jnp.float32),
                              (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    if rate > 0.0:
        dp = jnp.where(keep, dpd / (1.0 - rate), 0.0)
    else:
        dp = dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(ds, k.astype(jnp.float32),
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q.astype(jnp.float32),
                             (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(b, h, s, dh, n_out):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    t = pl.BlockSpec((1, h, s, dh), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    return seed, t


def _run_fwd(seed, q, k, v, rate):
    from jax.experimental import pallas as pl

    b, h, s, dh = q.shape
    seed_spec, t_spec = _specs(b, h, s, dh, 1)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate),
        grid=(b,),
        in_specs=[seed_spec, t_spec, t_spec, t_spec],
        out_specs=t_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(seed, q, k, v)


def _run_bwd(seed, q, k, v, g, rate):
    from jax.experimental import pallas as pl

    b, h, s, dh = q.shape
    seed_spec, t_spec = _specs(b, h, s, dh, 3)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate),
        grid=(b,),
        in_specs=[seed_spec, t_spec, t_spec, t_spec, t_spec],
        out_specs=[t_spec, t_spec, t_spec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
    )(seed, q, k, v, g)


def _reference(seed, q, k, v, rate, train):
    """jnp fallback and ground truth; the dropout stream differs from the
    kernel's (same distribution), so exact comparisons use rate=0."""
    weights = jnp.einsum("bhsd,bhtd->bhst", q, k,
                         preferred_element_type=jnp.float32)
    p = jax.nn.softmax(weights, axis=-1)
    if rate > 0.0 and train:
        mask_key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
        keep = jax.random.bernoulli(mask_key, 1.0 - rate, p.shape)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    out = jnp.einsum("bhst,bhtd->bhsd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(seed, q, k, v, rate: float = 0.0, train: bool = False):
    """softmax(q kᵀ) [dropout] v, fused per batch row.

    q/k/v: (B, H, S, Dh), pre-scaled q. seed: (1,) int32 — dropout stream
    (ignored when rate == 0 or not train). Differentiable w.r.t. q, k, v.
    """
    eff_rate = rate if train else 0.0
    if jax.default_backend() == "tpu" and q.shape[2] <= MAX_S:
        return _run_fwd(seed, q, k, v, eff_rate)
    return _reference(seed, q, k, v, eff_rate, True)


def _vjp_fwd(seed, q, k, v, rate, train):
    return fused_attention(seed, q, k, v, rate, train), (seed, q, k, v)


def _vjp_bwd(rate, train, res, g):
    import numpy as np

    seed, q, k, v = res
    eff_rate = rate if train else 0.0
    if jax.default_backend() == "tpu" and q.shape[2] <= MAX_S:
        dq, dk, dv = _run_bwd(seed, q, k, v, g, eff_rate)
    else:
        _, vjp = jax.vjp(lambda q, k, v: _reference(seed, q, k, v, eff_rate,
                                                    True), q, k, v)
        dq, dk, dv = vjp(g)
    seed_ct = np.zeros(seed.shape, jax.dtypes.float0)  # int arg: zero tangent
    return seed_ct, dq, dk, dv


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Packed-QKV variant: heads are split INSIDE the kernel.
#
# The (B, S, C) -> (B, H, S, C/H) head split/merge around the original kernel
# lowers to physical HBM layout copies — measured at ~65 ms/step of the
# headline config (scripts/profile_train.py: `copy bf16[256,256,4,24]` et
# al. dominate the copy bucket). Taking the in_proj output (B, S, 3C)
# directly and reshaping to (S, H, Dh) in VMEM turns those HBM round trips
# into register/VMEM relayouts. Packing order matches GatedAttn's in_proj:
# [k | v | q] along the channel axis; q is scaled by Dh^-1/2 in-kernel.
# ---------------------------------------------------------------------------


def _batch_block(b, s, dtype):
    """Batch rows per program: amortize DMA/grid overhead (a (1, S, 3C)
    block is a ~150 KB transfer and a handful of thin-K dots — measured
    0.26-0.43 ms/launch) while keeping per-head fp32 score scratch
    (~6 x MB x S x S x 4B in the bwd kernel) well inside VMEM."""
    # the bwd kernel keeps ~6-7 (MB, S, S) fp32 buffers live against the
    # 16 MB scoped-vmem stack limit -> cap one buffer at ~2 MB (MB=8 at
    # S=256 bf16 measured OK; 4 MB/buffer OOMed the scoped stack). fp32
    # inputs double the in/out block footprint -> halve the budget (fp32
    # at MB=8/S=256 OOMed at 22 M).
    budget = 2 * 1024 * 1024
    if jnp.dtype(dtype).itemsize >= 4:
        budget //= 2
    mb = max(1, min(32, budget // (s * s * 4)))
    while b % mb:
        mb -= 1
    return mb


def _dot(a, b, dims):
    """Batched 2D dot: batch dim 0 (the only position Mosaic supports)."""
    (lc, rc) = dims
    return jax.lax.dot_general(a, b, ((lc, rc), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _fwd_kernel_qkv(seed_ref, qkv_ref, o_ref, *, rate, heads):
    """Heads processed as an unrolled loop of lane-sliced batched dots:
    Mosaic supports neither lane-splitting shape casts nor batch dims off
    position 0, but static lane slices + batch-0 dots lower cleanly. The
    per-head slices/concat stay in VMEM — the point of the packed layout."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qkv = qkv_ref[...]  # (MB, S, 3C) [k|v|q]
    c = qkv.shape[2] // 3
    dh = c // heads
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    for h in range(heads):
        lo = h * dh
        k = qkv[:, :, lo:lo + dh]
        v = qkv[:, :, c + lo:c + lo + dh]
        q = qkv[:, :, 2 * c + lo:2 * c + lo + dh] * (dh ** -0.5)
        s = _dot(q, k, (((2,), (2,))))  # (MB, S, S)
        p = _softmax_last(s)
        if rate > 0.0:
            keep = _dropout_keep(p.shape, rate)
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
        o = _dot(p.astype(v.dtype), v, (((2,), (1,))))
        o_ref[:, :, lo:lo + dh] = o.astype(o_ref.dtype)


def _bwd_kernel_qkv(seed_ref, qkv_ref, g_ref, dqkv_ref, *, rate, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qkv = qkv_ref[...]  # (MB, S, 3C)
    c = qkv.shape[2] // 3
    dh = c // heads
    if rate > 0.0:
        # same seed and same per-head generation order as the forward kernel
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    for h in range(heads):
        lo = h * dh
        k = qkv[:, :, lo:lo + dh]
        v = qkv[:, :, c + lo:c + lo + dh]
        q = qkv[:, :, 2 * c + lo:2 * c + lo + dh] * (dh ** -0.5)
        g = g_ref[:, :, lo:lo + dh]  # stays bf16: matmul operand
        s = _dot(q, k, (((2,), (2,))))
        p = _softmax_last(s)
        if rate > 0.0:
            keep = _dropout_keep(p.shape, rate)
            pd = jnp.where(keep, p / (1.0 - rate), 0.0)
        else:
            pd = p
        # dV = Pd^T g; dPd = g V^T; dS = P*(dP - rowsum(dP*P));
        # dQs = dS K; dK = dS^T Qs (Qs = scaled q; chain scale into dQ).
        # Matmul OPERANDS are cast to the input dtype (bf16): MXU runs
        # bf16 x bf16 -> fp32-accumulate at full rate, while fp32 operands
        # drop to the fp32 rate — measured 0.35 ms/launch at S=256. The
        # softmax/ds elementwise math stays fp32.
        in_dt = qkv.dtype
        dv = _dot(pd.astype(in_dt), g, (((1,), (1,))))
        dpd = _dot(g, v, (((2,), (2,))))
        dp = jnp.where(keep, dpd / (1.0 - rate), 0.0) if rate > 0.0 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(in_dt)
        dq = _dot(ds, k, (((2,), (1,)))) * (dh ** -0.5)
        dk = _dot(ds, q.astype(in_dt), (((1,), (1,))))
        dqkv_ref[:, :, lo:lo + dh] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, c + lo:c + lo + dh] = dv.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * c + lo:2 * c + lo + dh] = dq.astype(dqkv_ref.dtype)


def _run_qkv(kernel, seed, qkv, g, rate, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, c3 = qkv.shape
    mb = _batch_block(b, s, qkv.dtype)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec((mb, s, c3), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    third = pl.BlockSpec((mb, s, c3 // 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    if g is None:
        return pl.pallas_call(
            functools.partial(kernel, rate=rate, heads=heads),
            grid=(b // mb,), in_specs=[seed_spec, full], out_specs=third,
            out_shape=jax.ShapeDtypeStruct((b, s, c3 // 3), qkv.dtype),
        )(seed, qkv)
    return pl.pallas_call(
        functools.partial(kernel, rate=rate, heads=heads),
        grid=(b // mb,), in_specs=[seed_spec, full, third], out_specs=full,
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
    )(seed, qkv, g)


def _reference_qkv(seed, qkv, heads, rate, train):
    b, s, c3 = qkv.shape
    c = c3 // 3
    dh = c // heads
    hsplit = lambda t: t.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
    k, v, q = hsplit(qkv[..., :c]), hsplit(qkv[..., c:2 * c]), hsplit(qkv[..., 2 * c:])
    out = _reference(seed, q * dh ** -0.5, k, v, rate, train)
    return out.transpose(0, 2, 1, 3).reshape(b, s, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_attention_qkv(seed, qkv, num_heads: int, rate: float = 0.0,
                        train: bool = False):
    """Multi-head softmax(q kᵀ/√Dh) [dropout] v on a packed projection.

    qkv: (B, S, 3C) laid out [k | v | q] (GatedAttn's in_proj order); heads
    split in VMEM. Returns (B, S, C). Differentiable w.r.t. qkv.
    """
    eff_rate = rate if train else 0.0
    if jax.default_backend() == "tpu" and qkv.shape[1] <= MAX_S:
        return _run_qkv(_fwd_kernel_qkv, seed, qkv, None, eff_rate, num_heads)
    return _reference_qkv(seed, qkv, num_heads, eff_rate, True)


def _vjp_fwd_qkv(seed, qkv, num_heads, rate, train):
    return fused_attention_qkv(seed, qkv, num_heads, rate, train), (seed, qkv)


def _vjp_bwd_qkv(num_heads, rate, train, res, g):
    import numpy as np

    seed, qkv = res
    eff_rate = rate if train else 0.0
    if jax.default_backend() == "tpu" and qkv.shape[1] <= MAX_S:
        dqkv = _run_qkv(_bwd_kernel_qkv, seed, qkv, g.astype(qkv.dtype),
                        eff_rate, num_heads)
    else:
        _, vjp = jax.vjp(lambda t: _reference_qkv(seed, t, num_heads,
                                                  eff_rate, True), qkv)
        (dqkv,) = vjp(g)
    seed_ct = np.zeros(seed.shape, jax.dtypes.float0)
    return seed_ct, dqkv


fused_attention_qkv.defvjp(_vjp_fwd_qkv, _vjp_bwd_qkv)


# ---------------------------------------------------------------------------
# Projection-fused variant: the qkv projection matmul runs INSIDE the Pallas
# kernel, so the (B, S, 3C) projection never exists in HBM at all — not as a
# saved residual (the largest no-remat activation class, bf16[K,B,S,3C]
# buffers of 192 MB each at CIFAR level 1) and not as a backward-recompute
# staging buffer either (the r3 xprof showed `checkpoint bf16[256,256,288]`
# copies at ~45 ms/step feeding the kernels when the projection was computed
# OUTSIDE the pallas_call). Residuals: (B, S, C) seq + the (3C, C) weight.
# The backward kernel accumulates dW across sequential grid programs in the
# revisited output block and emits dseq per block.
# ---------------------------------------------------------------------------


def _kernel_proj_qkv(seq, w):
    """(MB, S, C) @ (3C, C)^T on the MXU, inside the kernel. 2D dots only —
    Mosaic rejects >2D non-batch contractions."""
    mb, s, c = seq.shape
    qkv2d = jax.lax.dot_general(
        seq.reshape(mb * s, c), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return qkv2d.reshape(mb, s, w.shape[0]).astype(seq.dtype)


def _fwd_kernel_proj(seed_ref, seq_ref, w_ref, o_ref, *, rate, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qkv = _kernel_proj_qkv(seq_ref[...], w_ref[...])  # (MB, S, 3C) in VMEM
    c = qkv.shape[2] // 3
    dh = c // heads
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    for h in range(heads):
        lo = h * dh
        k = qkv[:, :, lo:lo + dh]
        v = qkv[:, :, c + lo:c + lo + dh]
        q = qkv[:, :, 2 * c + lo:2 * c + lo + dh] * (dh ** -0.5)
        s = _dot(q, k, (((2,), (2,))))
        p = _softmax_last(s)
        if rate > 0.0:
            keep = _dropout_keep(p.shape, rate)
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
        o = _dot(p.astype(v.dtype), v, (((2,), (1,))))
        o_ref[:, :, lo:lo + dh] = o.astype(o_ref.dtype)


def _bwd_kernel_proj(seed_ref, seq_ref, w_ref, g_ref, dseq_ref, dw_ref,
                     dqkv_scr, *, rate, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seq = seq_ref[...]
    w = w_ref[...]
    qkv = _kernel_proj_qkv(seq, w)
    mb, s_len, c3 = qkv.shape
    c = c3 // 3
    dh = c // heads
    in_dt = qkv.dtype
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    for h in range(heads):
        lo = h * dh
        k = qkv[:, :, lo:lo + dh]
        v = qkv[:, :, c + lo:c + lo + dh]
        q = qkv[:, :, 2 * c + lo:2 * c + lo + dh] * (dh ** -0.5)
        g = g_ref[:, :, lo:lo + dh]
        s = _dot(q, k, (((2,), (2,))))
        p = _softmax_last(s)
        if rate > 0.0:
            keep = _dropout_keep(p.shape, rate)
            pd = jnp.where(keep, p / (1.0 - rate), 0.0)
        else:
            pd = p
        dv = _dot(pd.astype(in_dt), g, (((1,), (1,))))
        dpd = _dot(g, v, (((2,), (2,))))
        dp = jnp.where(keep, dpd / (1.0 - rate), 0.0) if rate > 0.0 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(in_dt)
        dq = _dot(ds, k, (((2,), (1,)))) * (dh ** -0.5)
        dk = _dot(ds, q.astype(in_dt), (((1,), (1,))))
        dqkv_scr[:, :, lo:lo + dh] = dk.astype(dqkv_scr.dtype)
        dqkv_scr[:, :, c + lo:c + lo + dh] = dv.astype(dqkv_scr.dtype)
        dqkv_scr[:, :, 2 * c + lo:2 * c + lo + dh] = dq.astype(dqkv_scr.dtype)
    dqkv2d = dqkv_scr[...].reshape(mb * s_len, c3)
    # dseq = dqkv @ w  — (MB*S, 3C) x (3C, C)
    dseq2d = jax.lax.dot_general(dqkv2d, w, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dseq_ref[...] = dseq2d.reshape(mb, s_len, -1).astype(dseq_ref.dtype)
    # dW += dqkv^T @ seq — fp32-accumulated across the sequential grid in the
    # revisited output block (constant index_map)
    seq2d = seq.reshape(mb * s_len, -1)
    dw_blk = jax.lax.dot_general(dqkv2d, seq2d, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    dw_ref[...] = dw_ref[...] + dw_blk


def _run_proj_fwd(seed, seq, w, rate, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, c = seq.shape
    mb = _batch_block(b, s, seq.dtype)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    blk = pl.BlockSpec((mb, s, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((3 * c, c), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_proj, rate=rate, heads=heads),
        grid=(b // mb,), in_specs=[seed_spec, blk, w_spec], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, s, c), seq.dtype),
    )(seed, seq, w)


def _run_proj_bwd(seed, seq, w, g, rate, heads):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, c = seq.shape
    mb = _batch_block(b, s, seq.dtype)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    blk = pl.BlockSpec((mb, s, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((3 * c, c), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    dseq, dw = pl.pallas_call(
        functools.partial(_bwd_kernel_proj, rate=rate, heads=heads),
        grid=(b // mb,),
        in_specs=[seed_spec, blk, w_spec, blk],
        out_specs=[blk, w_spec],
        out_shape=[jax.ShapeDtypeStruct((b, s, c), seq.dtype),
                   jax.ShapeDtypeStruct((3 * c, c), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((mb, s, 3 * c), seq.dtype)],
    )(seed, seq, w, g)
    return dseq, dw


def _proj(seq, w):
    y = jnp.einsum("bsc,oc->bso", seq, w.astype(seq.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(seq.dtype)


# ---------------------------------------------------------------------------
# Long-sequence variant: grid over (batch x head), one (S, S) fp32 score
# buffer per program. At 64px the level-0 sequence is S=1024: the batch-
# blocked kernels' (MB, S, S) stacks blow the 16 MB scoped stack, and the
# jnp fallback materializes (B, H, S, S) score/mask tensors in HBM — the
# r5 i64 anatomy (mfu_hw 2.7%, docs/BENCHMARKS.md "ImageNet-64"). Here a
# program holds one head's q/k/v (S, Dh) slices + one 4 MB score buffer;
# the dropout mask is REGENERATED from the same per-program seed wherever
# it is needed (never stored: an (S, S) uint32 buffer is another 4 MB).
# The projection runs outside the kernel (a well-shaped XLA matmul).
# ---------------------------------------------------------------------------

MAX_S_LONG = 2048  # 4 MB fp32 scores; above this an S-tiled kernel is needed


def _fwd_kernel_bh(seed_ref, q_ref, k_ref, v_ref, o_ref, *, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = q_ref[0, 0]  # (S, Dh)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = _softmax_last(s)
    if rate > 0.0:
        # distinct stream per (batch, head) program on the 2-D grid
        pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        pltpu.prng_seed(seed_ref[0] + pid)
        keep = _dropout_keep(p.shape, rate)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel_bh(seed_ref, q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref,
                   dv_ref, *, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0]  # bf16 matmul operand
    in_dt = q.dtype
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = _softmax_last(s)  # fp32 (S, S); `s` is dead after this
    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    if rate > 0.0:
        # regenerate (not store) the keep mask at each use: the SAME seed
        # reproduces the SAME bits
        pltpu.prng_seed(seed_ref[0] + pid)
        keep = _dropout_keep(p.shape, rate)
        pd = jnp.where(keep, p / (1.0 - rate), 0.0).astype(in_dt)
    else:
        pd = p.astype(in_dt)
    # dV = Pd^T g
    dv = jax.lax.dot_general(pd, g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    # dPd = g V^T ; dP = mask * dPd / (1-r) ; dS = P (dP - rowsum(dP P))
    dpd = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pid)
        keep = _dropout_keep(p.shape, rate)
        dp = jnp.where(keep, dpd / (1.0 - rate), 0.0)
    else:
        dp = dpd
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(in_dt)
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)


def _run_bh(kernel, seed, q, k, v, g, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, s, dh = q.shape
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    blk = pl.BlockSpec((1, 1, s, dh), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    if g is None:
        return pl.pallas_call(
            functools.partial(kernel, rate=rate),
            grid=(b, h), in_specs=[seed_spec, blk, blk, blk], out_specs=blk,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        )(seed, q, k, v)
    return pl.pallas_call(
        functools.partial(kernel, rate=rate),
        grid=(b, h), in_specs=[seed_spec, blk, blk, blk, blk],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
    )(seed, q, k, v, g)


def _split_heads(qkv, heads):
    b, s, c3 = qkv.shape
    c = c3 // 3
    dh = c // heads
    hsplit = lambda t: t.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
    k = hsplit(qkv[..., :c])
    v = hsplit(qkv[..., c:2 * c])
    q = hsplit(qkv[..., 2 * c:]) * (dh ** -0.5)
    return q, k, v


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_long(seed, seq, w, num_heads: int, rate: float = 0.0,
                         train: bool = False):
    """Multi-head attention for MAX_S < S <= MAX_S_LONG: projection as an
    XLA matmul, per-(batch, head) Pallas programs for scores/softmax/
    dropout/PV; the (S, S) weights and masks never exist in HBM. Same
    [k|v|q] packed w layout as fused_attention_proj."""
    eff_rate = rate if train else 0.0
    if jax.default_backend() == "tpu" and seq.shape[1] <= MAX_S_LONG:
        q, k, v = _split_heads(_proj(seq, w), num_heads)
        o = _run_bh(_fwd_kernel_bh, seed, q, k, v, None, eff_rate)
        b, h, s, dh = o.shape
        return o.transpose(0, 2, 1, 3).reshape(b, s, h * dh)
    return _reference_qkv(seed, _proj(seq, w), num_heads, eff_rate, True)


def _vjp_fwd_long(seed, seq, w, num_heads, rate, train):
    return fused_attention_long(seed, seq, w, num_heads, rate, train), \
        (seed, seq, w)


def _vjp_bwd_long(num_heads, rate, train, res, g):
    import numpy as np

    seed, seq, w = res
    eff_rate = rate if train else 0.0
    if jax.default_backend() == "tpu" and seq.shape[1] <= MAX_S_LONG:
        qkv = _proj(seq, w)
        q, k, v = _split_heads(qkv, num_heads)
        b, s, c = seq.shape
        dh = c // num_heads
        g4 = g.astype(seq.dtype).reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)
        dq, dk, dv = _run_bh(_bwd_kernel_bh, seed, q, k, v, g4, eff_rate)
        merge = lambda t: t.transpose(0, 2, 1, 3).reshape(b, s, c)
        # packed [k|v|q] cotangent; q carried the Dh^-1/2 scale
        dqkv = jnp.concatenate(
            [merge(dk), merge(dv), merge(dq) * (dh ** -0.5)], axis=-1)
        dqkv32 = dqkv.astype(jnp.float32)
        dseq = jnp.einsum("bso,oc->bsc", dqkv32, w.astype(jnp.float32),
                          preferred_element_type=jnp.float32).astype(seq.dtype)
        dw = jnp.einsum("bso,bsc->oc", dqkv32, seq.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    else:
        qkv = _proj(seq, w)
        _, vjp = jax.vjp(lambda t: _reference_qkv(seed, t, num_heads,
                                                  eff_rate, True), qkv)
        (dqkv,) = vjp(g)
        dqkv32 = dqkv.astype(jnp.float32)
        dseq = jnp.einsum("bso,oc->bsc", dqkv32, w.astype(jnp.float32),
                          preferred_element_type=jnp.float32).astype(seq.dtype)
        dw = jnp.einsum("bso,bsc->oc", dqkv32, seq.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    seed_ct = np.zeros(seed.shape, jax.dtypes.float0)
    return seed_ct, dseq, dw.astype(w.dtype)


fused_attention_long.defvjp(_vjp_fwd_long, _vjp_bwd_long)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_proj(seed, seq, w, num_heads: int, rate: float = 0.0,
                         train: bool = False):
    """Multi-head attention with the qkv projection fused INTO the kernel.
    seq (B, S, C); w (3C, C) effective (weight-normalized) in_proj matrix,
    rows ordered [k | v | q]; q scaled by Dh^-1/2 in-kernel."""
    eff_rate = rate if train else 0.0
    if jax.default_backend() == "tpu" and seq.shape[1] <= MAX_S:
        return _run_proj_fwd(seed, seq, w, eff_rate, num_heads)
    return _reference_qkv(seed, _proj(seq, w), num_heads, eff_rate, True)


def _vjp_fwd_proj(seed, seq, w, num_heads, rate, train):
    return fused_attention_proj(seed, seq, w, num_heads, rate, train), \
        (seed, seq, w)


def _vjp_bwd_proj(num_heads, rate, train, res, g):
    import numpy as np

    seed, seq, w = res
    eff_rate = rate if train else 0.0
    if jax.default_backend() == "tpu" and seq.shape[1] <= MAX_S:
        dseq, dw = _run_proj_bwd(seed, seq, w, g.astype(seq.dtype),
                                 eff_rate, num_heads)
    else:
        qkv = _proj(seq, w)
        _, vjp = jax.vjp(lambda t: _reference_qkv(seed, t, num_heads,
                                                  eff_rate, True), qkv)
        (dqkv,) = vjp(g)
        dqkv32 = dqkv.astype(jnp.float32)
        dseq = jnp.einsum("bso,oc->bsc", dqkv32, w.astype(jnp.float32),
                          preferred_element_type=jnp.float32).astype(seq.dtype)
        dw = jnp.einsum("bso,bsc->oc", dqkv32, seq.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    seed_ct = np.zeros(seed.shape, jax.dtypes.float0)
    return seed_ct, dseq, dw.astype(w.dtype)


fused_attention_proj.defvjp(_vjp_fwd_proj, _vjp_bwd_proj)
