"""Modulated deformable convolution (DCNv2), TPU-native.

Reference capability: `basicsr...DCNv2Pack` as used by PCD alignment
(/root/reference/operations.py:393-516). The CUDA op gathers k*k bilinear
samples per output pixel inside one fused kernel; that layout is hostile to
the MXU, so here the op is decomposed the TPU way:

  1. for each of the k*k kernel taps (static Python loop -> unrolled XLA),
     bilinearly sample the whole feature map at `base_grid + tap + offset`
     with vectorized `take_along_axis` gathers (4 corner reads per tap);
  2. scale each tap's sample by its sigmoid modulation mask;
  3. contract the stacked (B, k*k, C, H, W) samples with the (O, C, kh, kw)
     weight in ONE einsum -> a single large MXU matmul.

Offsets follow the DCNv2 channel convention: `conv_offset` produces
3*dg*k*k channels split into (o_y, o_x, mask_logit); taps are ordered
row-major over (kh, kw) and deformable groups partition the input channels.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def bilinear_sample(x, coords_y, coords_x):
    """Sample x (B, C, H, W) at float coords (B, G, H', W') per group.

    Returns (B, G, C//G-grouped) samples arranged (B, G, Cg, H', W') where the
    C axis is split into G deformable groups. Out-of-bounds reads use zero
    padding (matches torchvision.ops.deform_conv2d semantics).
    """
    b, c, h, w = x.shape
    g = coords_y.shape[1]
    cg = c // g
    xg = x.reshape(b, g, cg, h, w)

    y0 = jnp.floor(coords_y)
    x0 = jnp.floor(coords_x)
    wy = coords_y - y0
    wx = coords_x - x0

    out = 0.0
    for dy, wyy in ((0, 1.0 - wy), (1, wy)):
        for dx, wxx in ((0, 1.0 - wx), (1, wx)):
            yi = y0 + dy
            xi = x0 + dx
            valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            flat = (yc * w + xc).reshape(b, g, 1, -1)  # (B, G, 1, H'*W')
            vals = jnp.take_along_axis(
                xg.reshape(b, g, cg, h * w),
                jnp.broadcast_to(flat, (b, g, cg, flat.shape[-1])), axis=-1)
            vals = vals.reshape(b, g, cg, *coords_y.shape[2:])
            out = out + vals * (wyy * wxx * valid)[:, :, None]
    return out


def modulated_deform_conv2d(x, offset, mask, w, b=None, *, groups: int = 1):
    """DCNv2: x (B, C, H, W); offset (B, 2*dg*kh*kw, H, W) ordered
    (dg, kh*kw, [y, x]); mask (B, dg*kh*kw, H, W) already in (0, 1);
    w (O, C, kh, kw). Stride 1, 'same' padding (the PCD configuration).
    """
    bsz, c, h, wdt = x.shape
    o, _, kh, kw = w.shape
    dg = mask.shape[1] // (kh * kw)
    off = offset.reshape(bsz, dg, kh * kw, 2, h, wdt)
    msk = mask.reshape(bsz, dg, kh * kw, h, wdt)

    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=x.dtype),
                          jnp.arange(wdt, dtype=x.dtype), indexing="ij")

    taps = []
    for t in range(kh * kw):
        i, j = divmod(t, kw)
        cy = gy[None, None] + (i - (kh - 1) // 2) + off[:, :, t, 0]
        cx = gx[None, None] + (j - (kw - 1) // 2) + off[:, :, t, 1]
        s = bilinear_sample(x, cy, cx)  # (B, dg, C/dg, H, W)
        taps.append(s * msk[:, :, t][:, :, None])
    # (B, kh*kw, C, H, W) -> one big contraction with w (O, C, kh, kw)
    patches = jnp.stack([t.reshape(bsz, c, h, wdt) for t in taps], axis=1)
    wk = w.reshape(o, c, kh * kw).transpose(2, 1, 0)  # (k*k, C, O)
    y = jnp.einsum("btchw,tco->bohw", patches, wk,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1)
    return y


class DCNPack:
    """DCNv2Pack: offsets/masks predicted from a separate feature map.

    conv_offset(extra_feat) -> (o1, o2, mask_logit) chunked on channels;
    offset = concat(o1, o2) interleaved per DCNv2 convention, mask = sigmoid.
    """

    def __init__(self, in_ch: int, out_ch: int, k: int = 3,
                 deformable_groups: int = 8):
        self.in_ch, self.out_ch, self.k = in_ch, out_ch, k
        self.dg = deformable_groups

    def init(self, key):
        k1, k2 = jax.random.split(key)
        fan = self.in_ch * self.k * self.k
        bound = 1.0 / math.sqrt(fan)
        n_off = 3 * self.dg * self.k * self.k
        return {
            "w": jax.random.uniform(k1, (self.out_ch, self.in_ch, self.k, self.k),
                                    minval=-bound, maxval=bound),
            "b": jnp.zeros((self.out_ch,)),
            # offset conv initialized to zero (standard DCN init: start as
            # a plain conv)
            "off_w": jnp.zeros((n_off, self.in_ch, self.k, self.k)),
            "off_b": jnp.zeros((n_off,)),
        }

    def apply(self, params, x, extra_feat):
        from .convrnn import _convnd

        out = _convnd(extra_feat, params["off_w"], params["off_b"], ndim=2)
        n = self.dg * self.k * self.k
        o1, o2, m = out[:, :n], out[:, n:2 * n], out[:, 2 * n:]
        bsz, _, h, w = x.shape
        # DCNv2 packs (y, x) pairs per tap: interleave o1 (y) and o2 (x).
        # KNOWN DEVIATION from the reference DCNv2Pack (EDVR_arch-style),
        # which does torch.cat((o1, o2), dim=1) and lets the CUDA kernel
        # read that concatenated layout as interleaved (y, x) — a different
        # effective channel permutation of the zero-initialized offset conv.
        # Equivalent when training from scratch (offsets start at zero and
        # the permutation is absorbed by the learned off_w); transplanting a
        # PRETRAINED reference EDVR checkpoint would require permuting
        # off_w/off_b rows to this interleaved order first.
        off = jnp.stack([o1.reshape(bsz, self.dg, -1, h, w),
                         o2.reshape(bsz, self.dg, -1, h, w)], axis=3)
        off = off.reshape(bsz, -1, h, w)
        mask = jax.nn.sigmoid(m)
        return modulated_deform_conv2d(x, off, mask, params["w"], params["b"],
                                       groups=1)
