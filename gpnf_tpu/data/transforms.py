"""Image augmentations as vectorized numpy ops over whole batches.

Reference semantics: flow_modules/misc.py (ShiftTransform 38-51 — ±3px
edge-pad random crop along ONE axis per image; MnistGlowTransform 53-72 —
pad 28->32 with the per-image minimum and tile to 3 channels). The reference
applies these per-image inside PIL; here they are batched numpy, executed on
host while the accelerator runs the previous step.
"""
from __future__ import annotations

import numpy as np


def mnist_glow_pad(images: np.ndarray) -> np.ndarray:
    """(N, 28, 28) uint8 -> (N, 3, 32, 32) uint8, min-pad + channel tile."""
    n = images.shape[0]
    mins = images.reshape(n, -1).min(axis=1)
    out = np.empty((n, 32, 32), dtype=images.dtype)
    out[:] = mins[:, None, None]
    out[:, 2:30, 2:30] = images
    return np.repeat(out[:, None], 3, axis=1)


def shift_augment(rng: np.random.Generator, images: np.ndarray,
                  pixels: int = 3) -> np.ndarray:
    """Random edge-pad shift crop along one axis per image (NCHW uint8/float)."""
    n, _, h, w = images.shape
    padded = np.pad(images, ((0, 0), (0, 0), (pixels, pixels), (pixels, pixels)),
                    mode="edge")
    shifts = rng.integers(0, 2 * pixels, size=n)
    horizontal = rng.random(n) < 0.5
    out = np.empty_like(images)
    for i in range(n):  # cheap relative to the device step; numpy slicing only
        s = shifts[i]
        if horizontal[i]:
            out[i] = padded[i, :, pixels : pixels + h, s : s + w]
        else:
            out[i] = padded[i, :, s : s + h, pixels : pixels + w]
    return out


def random_flip(rng: np.random.Generator, images: np.ndarray) -> np.ndarray:
    """Random horizontal flip per image (NCHW)."""
    flip = rng.random(images.shape[0]) < 0.5
    out = images.copy()
    out[flip] = out[flip, :, :, ::-1]
    return out
