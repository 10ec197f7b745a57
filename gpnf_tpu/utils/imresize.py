"""MATLAB-compatible bicubic resize (numpy).

Reference: imresize.py (cubic kernel 53-61, contribution weights 63-84,
imresize 136-175). Used for the LR-consistency PSNR metric and dataset
preparation. Written from the MATLAB imresize algorithm: an antialiased
cubic kernel (a=-0.5) whose support is widened by 1/scale when downsampling,
applied separably per axis with edge clamping.
"""
from __future__ import annotations

import numpy as np


def _cubic(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    return ((1.5 * ax3 - 2.5 * ax2 + 1.0) * (ax <= 1)
            + (-0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0) * ((ax > 1) & (ax <= 2)))


def _contributions(in_len: int, out_len: int, scale: float):
    kernel_width = 4.0
    if scale < 1.0:  # antialias when shrinking
        kernel_width /= scale
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - kernel_width / 2.0)
    p = int(np.ceil(kernel_width)) + 2
    idx = left[:, None] + np.arange(p)[None, :] - 1  # 0-based candidate indices
    dist = u[:, None] - (idx + 1)
    if scale < 1.0:
        weights = scale * _cubic(dist * scale)
    else:
        weights = _cubic(dist)
    weights /= weights.sum(axis=1, keepdims=True)
    idx = np.clip(idx, 0, in_len - 1).astype(np.int64)  # replicate edges
    # drop all-zero columns
    keep = ~np.all(weights == 0, axis=0)
    return weights[:, keep], idx[:, keep]


def imresize(img: np.ndarray, scale: float) -> np.ndarray:
    """img: (H, W) or (H, W, C) float array; returns MATLAB-bicubic resize."""
    img = np.asarray(img, dtype=np.float64)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    out_h = int(np.ceil(h * scale))
    out_w = int(np.ceil(w * scale))

    wgt_h, idx_h = _contributions(h, out_h, scale)
    wgt_w, idx_w = _contributions(w, out_w, scale)

    # rows: gather (out_h, p, W, C) then weight-reduce over p
    out = np.einsum("ok,okwc->owc", wgt_h, img[idx_h])
    # cols: gather (out_h, out_w, p, C) then weight-reduce over p
    out = np.einsum("ok,hokc->hoc", wgt_w, out[:, idx_w])
    return out[:, :, 0] if squeeze else out
