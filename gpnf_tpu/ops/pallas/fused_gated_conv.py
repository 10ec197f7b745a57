"""Fused GatedConv kernel for the Flow++ coupling networks.

The PixelCNN++ gated residual conv (ops/mixlogcdf.py GatedConv; reference
math flow_modules/mixlogcdf_nn.py:227-260) is the flagship step's dominant
elementwise producer: concat-ELU -> 3x3 conv -> concat-ELU -> Dropout2d ->
1x1 GLU gate -> +residual emits 5+ full-tensor HBM round trips per block,
and the r4 winner anatomy attributes 86.7 ms/step (36.8k ~2.4 us fused
elementwise ops) largely to these chains (docs/BENCHMARKS.md).

This kernel computes the block's identical math in ONE pass per batch
block: both concat-ELUs, the 3x3 conv as 9 shifted MXU matmuls, the
channelwise dropout mask from the in-kernel PRNG, the 1x1 gate matmul, the
GLU, and the residual add — nothing but x and the output touches HBM.
The custom VJP recomputes the forward activations in VMEM (they are cheap
tap-matmuls) and emits dx plus fp32 weight/bias gradients accumulated
across the sequential grid, so the surrounding remat policy needs to save
only (x, effective weights) — exactly the "noattn" residual class.

Weight layouts (pre-transposed by the caller from OIHW):
    w1: (3, 3, 2C, C)   3x3 conv taps, input-major for x @ w1[ky, kx]
    wg: (2C, 2C)        1x1 gate, input-major for h2 @ wg
Dropout2d semantics: one mask per (batch, channel), regenerated identically
in the backward kernel from the same per-program seed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_S = 512  # spatial sites per image above which the jnp path is used


def _elu(z):
    # fp32 internals: Mosaic TC has no expm1 lowering and rejects cmpf on
    # packed bf16 vectors ("Target does not support this comparison"), so
    # compare/exp in fp32 and cast back. Differs from jax.nn.elu by <= fp32
    # rounding for z -> 0- (transplant parity tolerance is 1e-3).
    z32 = z.astype(jnp.float32)
    return jnp.where(z32 > 0, z32, jnp.exp(z32) - 1.0).astype(z.dtype)


def _delu(z):
    """elu'(z) = 1 for z > 0 else exp(z)."""
    return jnp.where(z > 0, jnp.ones_like(z), jnp.exp(z))


def _concat_elu(x):
    return _elu(jnp.concatenate([x, -x], axis=-1))


def _shift2d(t, dy, dx):
    """Zero-filled shift: out[:, y, x] = t[:, y+dy, x+dx] (static dy/dx)."""
    mb, h, w, c = t.shape
    if dy > 0:
        t = jnp.concatenate([t[:, dy:], jnp.zeros((mb, dy, w, c), t.dtype)], 1)
    elif dy < 0:
        t = jnp.concatenate([jnp.zeros((mb, -dy, w, c), t.dtype), t[:, :dy]], 1)
    if dx > 0:
        t = jnp.concatenate([t[:, :, dx:], jnp.zeros((mb, h, dx, c), t.dtype)], 2)
    elif dx < 0:
        t = jnp.concatenate([jnp.zeros((mb, h, -dx, c), t.dtype), t[:, :, :dx]], 2)
    return t


def _conv3x3_taps(h1, w1, out_ch):
    """SAME 3x3 conv as 9 shifted (MB*S, 2C) @ (2C, C) MXU matmuls."""
    mb, hh, ww, c2 = h1.shape
    acc = jnp.zeros((mb * hh * ww, out_ch), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            shifted = _shift2d(h1, ky - 1, kx - 1).reshape(mb * hh * ww, c2)
            acc = acc + jax.lax.dot_general(
                shifted, w1[ky, kx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.reshape(mb, hh, ww, out_ch)


def _conv3x3_taps_T(dh, w1, in_ch2):
    """Transpose conv of the tap form: dh1[:, y+dy, x+dx] += dh[:, y, x] W^T
    == shift(dh, -dy, -dx) @ w1[ky, kx]^T accumulated over taps."""
    mb, hh, ww, c = dh.shape
    acc = jnp.zeros((mb * hh * ww, in_ch2), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            shifted = _shift2d(dh, 1 - ky, 1 - kx).reshape(mb * hh * ww, c)
            acc = acc + jax.lax.dot_general(
                shifted, w1[ky, kx], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.reshape(mb, hh, ww, in_ch2)


def _drop_scale_rows(seed_ref, mb, s, c2, rate, dtype):
    """Dropout2d scale expanded to (MB*S, 2C): one (MB, 2C) channel mask
    per batch row from the in-kernel PRNG, spread over the spatial sites
    with an indicator matmul — Mosaic has no sublane broadcast, so
    keep[:, None, None, :] fails to lower at some shapes; E @ scale is a
    tiny always-supported MXU op. Entries are 0 or 1/(1-rate)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits((mb, c2)), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    scale = (bits >= threshold).astype(jnp.float32) / (1.0 - rate)
    rows = jax.lax.broadcasted_iota(jnp.int32, (mb * s, mb), 0) // s
    cols = jax.lax.broadcasted_iota(jnp.int32, (mb * s, mb), 1)
    e = (rows == cols).astype(jnp.float32)
    full = jax.lax.dot_general(e, scale, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    # input-dtype mask: the unfused path divides in x.dtype too, and the
    # fp32 copy pushed the fwd kernel over the scoped stack (17.58 M at
    # MB=16, S=256)
    return full.astype(dtype)


def _forward_math(x, w1, b1, wg, bg, drop):
    """The full block in VMEM values; shared by fwd and bwd kernels.
    drop: (MB*S, 2C) 0-or-1/(1-rate) Dropout2d scale, or None. Returns
    h2d ALREADY dropped (it is the gate matmul's true operand)."""
    dt = x.dtype
    h1 = _concat_elu(x)
    h = _conv3x3_taps(h1.astype(dt), w1, w1.shape[-1]).astype(dt) + b1
    h2 = _concat_elu(h)
    mb, hh, ww, c2 = h2.shape
    h2d = h2.reshape(mb * hh * ww, c2)
    if drop is not None:
        h2d = h2d * drop
    g = jax.lax.dot_general(h2d, wg, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = g.reshape(mb, hh, ww, c2).astype(dt) + bg
    a, b = jnp.split(g, 2, axis=-1)
    sig = jax.nn.sigmoid(b.astype(jnp.float32))
    out = a.astype(jnp.float32) * sig + x.astype(jnp.float32)
    return h1, h, h2d, a, b, sig, out


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, wg_ref, bg_ref, o_ref, *,
                rate):
    x = x_ref[...]
    mb, hh, ww, c = x.shape
    drop = (_drop_scale_rows(seed_ref, mb, hh * ww, 2 * c, rate, x.dtype)
            if rate > 0.0 else None)
    *_, out = _forward_math(x, w1_ref[...], b1_ref[...], wg_ref[...],
                            bg_ref[...], drop)
    o_ref[...] = out.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, wg_ref, bg_ref, g_ref,
                dx_ref, dw1_ref, db1_ref, dwg_ref, dbg_ref, *, rate):
    from jax.experimental import pallas as pl

    x = x_ref[...]
    w1 = w1_ref[...]
    wg = wg_ref[...]
    dt = x.dtype
    mb, hh, ww, c = x.shape
    n = mb * hh * ww
    drop = (_drop_scale_rows(seed_ref, mb, hh * ww, 2 * c, rate, dt)
            if rate > 0.0 else None)
    h1, h, h2d, a, b, sig, _ = _forward_math(x, w1, b1_ref[...], wg,
                                             bg_ref[...], drop)
    gout = g_ref[...].astype(jnp.float32)

    # GLU: out = a*sig(b) + x. Gradient-chain temporaries live in the INPUT
    # dtype (bf16 in production): fp32 temps measured 1.85 M scoped/row and
    # forced MB=4 (64 programs x full weight reloads); sums/accumulations
    # stay fp32.
    da = gout * sig
    db = gout * a.astype(jnp.float32) * sig * (1.0 - sig)
    dg = jnp.concatenate([da, db], axis=-1).astype(dt)  # (MB,H,W,2C)
    dg2d = dg.reshape(n, 2 * c)
    # gate matmul: g = h2d @ wg + bg  (h2d is post-dropout)
    dwg = jax.lax.dot_general(h2d, dg2d, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbg = jnp.sum(dg2d.astype(jnp.float32), axis=0)
    # fp32 acc (Mosaic requires 32-bit matmul acc), cast in the epilogue
    dh2d = jax.lax.dot_general(dg2d, wg, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    if drop is not None:
        dh2d = dh2d * drop
    dh2 = dh2d.astype(dt).reshape(mb, hh, ww, 2 * c)
    # concat-ELU around h
    hf = h.astype(jnp.float32)
    dh = (dh2[..., :c].astype(jnp.float32) * _delu(hf)
          - dh2[..., c:].astype(jnp.float32) * _delu(-hf))
    db1 = jnp.sum(dh.reshape(n, c), axis=0)
    # 3x3 conv: h = taps(h1) @ w1
    dh_c = dh.astype(dt)
    del dh
    h1d = h1.astype(dt)
    dw1_rows = []
    for ky in range(3):
        row = []
        for kx in range(3):
            shifted = _shift2d(h1d, ky - 1, kx - 1).reshape(n, 2 * c)
            row.append(jax.lax.dot_general(
                shifted, dh_c.reshape(n, c), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        dw1_rows.append(jnp.stack(row))
    dw1 = jnp.stack(dw1_rows)  # (3, 3, 2C, C)
    dh1 = _conv3x3_taps_T(dh_c, w1, 2 * c)
    # concat-ELU around x
    xf = x.astype(jnp.float32)
    dx = dh1[..., :c] * _delu(xf) - dh1[..., c:] * _delu(-xf)
    dx = dx + gout  # residual
    dx_ref[...] = dx.astype(dx_ref.dtype)

    # fp32 weight/bias grads accumulated across the sequential grid in the
    # revisited output blocks (constant index maps)
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dwg_ref[...] = jnp.zeros_like(dwg_ref)
        dbg_ref[...] = jnp.zeros_like(dbg_ref)

    dw1_ref[...] = dw1_ref[...] + dw1
    db1_ref[...] = db1_ref[...] + db1
    dwg_ref[...] = dwg_ref[...] + dwg
    dbg_ref[...] = dbg_ref[...] + dbg


def _batch_block(b, s, c, dtype, bwd=False, rate=0.0):
    """Batch rows per program against the 16 MB scoped-vmem stack.

    Measured tables, not formulas — small-S shift buffers pad their
    sublane tiles ~2x and the dropout expansion adds (MB*S, 2C) buffers,
    so linear models under-count (S=64 bwd at MB=32: 17.68 M; S=256 bwd
    at MB=16 with fp32 temps: 29.55 M; S=256 fwd at MB=16 with dropout:
    18.12 M)."""
    if bwd:
        # dropout adds (MB*S, 2C) mask buffers: 16.62 M at MB=8/S=256
        mb = 32 if s <= 16 else (16 if s <= 64 else (8 if rate == 0.0 else 4))
        if jnp.dtype(dtype).itemsize >= 4:
            mb = max(1, mb // 2)
    elif rate > 0.0:
        mb = 32 if s <= 64 else 8
        if jnp.dtype(dtype).itemsize >= 4:
            mb = max(1, mb // 2)
    else:
        budget = int(1.5 * 1024 * 1024)
        if jnp.dtype(dtype).itemsize >= 4:
            budget //= 2
        mb = max(1, min(32, budget // max(s * 2 * c * 2, 1)))
    while b % mb:
        mb -= 1
    return mb


def _run(kernel, seed, x, w1, b1, wg, bg, g, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hh, ww, c = x.shape
    mb = _batch_block(b, hh * ww, c, x.dtype, bwd=g is not None, rate=rate)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    xblk = pl.BlockSpec((mb, hh, ww, c), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    w1s = pl.BlockSpec((3, 3, 2 * c, c), lambda i: (0, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    wgs = pl.BlockSpec((2 * c, 2 * c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    vec_2c = pl.BlockSpec((2 * c,), lambda i: (0,), memory_space=pltpu.VMEM)
    if g is None:
        return pl.pallas_call(
            functools.partial(kernel, rate=rate),
            grid=(b // mb,),
            in_specs=[seed_spec, xblk, w1s, vec_c, wgs, vec_2c],
            out_specs=xblk,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(seed, x, w1, b1, wg, bg)
    return pl.pallas_call(
        functools.partial(kernel, rate=rate),
        grid=(b // mb,),
        in_specs=[seed_spec, xblk, w1s, vec_c, wgs, vec_2c, xblk],
        out_specs=[xblk, w1s, vec_c, wgs, vec_2c],
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(w1.shape, jnp.float32),
                   jax.ShapeDtypeStruct(b1.shape, jnp.float32),
                   jax.ShapeDtypeStruct(wg.shape, jnp.float32),
                   jax.ShapeDtypeStruct(bg.shape, jnp.float32)],
    )(seed, x, w1, b1, wg, bg, g)


def _reference(seed, x, w1, b1, wg, bg, rate, train):
    """jnp ground truth / CPU fallback — identical math to the unfused
    GatedConv.apply chain (the dropout stream differs from the kernel's:
    same Dropout2d distribution, exact comparisons use rate=0)."""
    dt = x.dtype
    h1 = _concat_elu(x)
    # SAME 3x3 conv via lax for the reference path
    w_oihw = jnp.transpose(w1, (3, 2, 0, 1))  # (C, 2C, 3, 3)
    # explicit fp32 preferred type breaks the conv transpose rule under AD
    # for bf16 operands (ops/conv.py:conv2d has the same guard)
    preferred = jnp.float32 if dt == jnp.float32 else None
    h = jax.lax.conv_general_dilated(
        h1.astype(dt), w_oihw.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=preferred).astype(dt) + b1
    h2 = _concat_elu(h)
    if rate > 0.0 and train:
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
        keep = jax.random.bernoulli(key, 1.0 - rate,
                                    (x.shape[0], 1, 1, h2.shape[-1]))
        h2 = jnp.where(keep, h2 / (1.0 - rate), 0.0)
    g = jnp.einsum("bhwi,io->bhwo", h2.astype(dt), wg.astype(dt),
                   preferred_element_type=jnp.float32).astype(dt) + bg
    a, b = jnp.split(g, 2, axis=-1)
    sig = jax.nn.sigmoid(b.astype(jnp.float32))
    return (a.astype(jnp.float32) * sig + x.astype(jnp.float32)).astype(dt)


def _use_kernel(x):
    return (jax.default_backend() == "tpu"
            and x.shape[1] * x.shape[2] <= MAX_S)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_gated_conv(seed, x, w1, b1, wg, bg, rate: float = 0.0,
                     train: bool = False):
    """GatedConv block + residual, fused: x (B, H, W, C) channel-last;
    w1 (3, 3, 2C, C) conv taps; wg (2C, 2C) gate (input-major); returns
    concat-ELU chain's GLU output + x. Differentiable w.r.t. x and all
    weights/biases; seed drives the Dropout2d stream."""
    eff_rate = rate if train else 0.0
    if _use_kernel(x):
        return _run(_fwd_kernel, seed, x, w1, b1, wg, bg, None, eff_rate)
    return _reference(seed, x, w1, b1, wg, bg, eff_rate, True)


def _vjp_fwd(seed, x, w1, b1, wg, bg, rate, train):
    out = fused_gated_conv(seed, x, w1, b1, wg, bg, rate, train)
    return out, (seed, x, w1, b1, wg, bg)


def _vjp_bwd(rate, train, res, g):
    import numpy as np

    seed, x, w1, b1, wg, bg = res
    eff_rate = rate if train else 0.0
    if _use_kernel(x):
        dx, dw1, db1, dwg, dbg = _run(_bwd_kernel, seed, x, w1, b1, wg, bg,
                                      g.astype(x.dtype), eff_rate)
    else:
        _, vjp = jax.vjp(lambda x, w1, b1, wg, bg: _reference(
            seed, x, w1, b1, wg, bg, eff_rate, True), x, w1, b1, wg, bg)
        dx, dw1, db1, dwg, dbg = vjp(g)
    seed_ct = np.zeros(seed.shape, jax.dtypes.float0)
    return (seed_ct, dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dwg.astype(wg.dtype), dbg.astype(bg.dtype))


fused_gated_conv.defvjp(_vjp_fwd, _vjp_bwd)
