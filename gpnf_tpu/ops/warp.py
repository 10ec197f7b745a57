"""Optical-flow warping (bilinear grid sample).

Reference: models/modules/module_util.py:71-95 (`flow_warp`) — warps an
image/feature map with a per-pixel displacement field, align_corners=True
bilinear sampling with zero padding outside, expressed here as gather +
lerp (vectorized, TPU-friendly; no scatter).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def flow_warp(x: jax.Array, flow: jax.Array, *, padding_zero: bool = True):
    """x: (B, C, H, W); flow: (B, H, W, 2) displacements (dx, dy) in pixels.

    Returns x sampled at (grid + flow). Matches torch grid_sample semantics
    with align_corners=True and zeros padding.
    """
    b, c, h, w = x.shape
    yy = jnp.arange(h, dtype=flow.dtype)
    xx = jnp.arange(w, dtype=flow.dtype)
    grid_y, grid_x = jnp.meshgrid(yy, xx, indexing="ij")
    sx = grid_x[None] + flow[..., 0]
    sy = grid_y[None] + flow[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = sx - x0
    ty = sy - y0

    def gather(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        # (B, H, W) index maps applied per batch: (B, C, H, W) gather
        vals = jax.vmap(lambda img, yv, xv: img[:, yv, xv])(x, yc, xc)
        if padding_zero:
            vals = vals * valid[:, None].astype(x.dtype)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    tx = tx[:, None].astype(x.dtype)
    ty = ty[:, None].astype(x.dtype)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty
