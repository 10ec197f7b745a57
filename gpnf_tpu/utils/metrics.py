"""Image quality metrics: PSNR, SSIM, optional LPIPS, LR-consistency.

Reference: Measure.py (psnr/ssim/lpips 31-53), utils/util.py:140-147
(calculate_psnr), test.py:150-154 (LR-consistency via MATLAB bicubic).
SSIM follows Wang et al. 2004 with the standard 11x11 Gaussian window,
matching skimage's `structural_similarity` defaults used by the reference.
"""
from __future__ import annotations

import numpy as np

from .imresize import imresize


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(data_range / np.sqrt(mse)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(ax**2) / (2 * sigma**2))
    w = np.outer(g, g)
    return w / w.sum()


def _filter2_valid(img: np.ndarray, win: np.ndarray) -> np.ndarray:
    """2D valid-mode correlation via stride tricks (no scipy dependency)."""
    k = win.shape[0]
    h, w = img.shape
    shape = (h - k + 1, w - k + 1, k, k)
    strides = img.strides * 2
    patches = np.lib.stride_tricks.as_strided(img, shape, strides)
    return np.einsum("ijkl,kl->ij", patches, win)


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Mean SSIM; multi-channel inputs are averaged per channel."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.ndim == 3:
        return float(np.mean([ssim(a[..., c], b[..., c], data_range)
                              for c in range(a.shape[-1])]))
    win = _gaussian_window()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _filter2_valid(a, win)
    mu_b = _filter2_valid(b, win)
    mu_a2, mu_b2, mu_ab = mu_a**2, mu_b**2, mu_a * mu_b
    sa = _filter2_valid(a * a, win) - mu_a2
    sb = _filter2_valid(b * b, win) - mu_b2
    sab = _filter2_valid(a * b, win) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * sab + c2)) / ((mu_a2 + mu_b2 + c1) * (sa + sb + c2))
    return float(np.mean(s))


def lpips_rf(a: np.ndarray, b: np.ndarray) -> float:
    """Random-feature perceptual distance — the in-env LPIPS stand-in.

    Mean squared distance between unit-normalized multi-stage random-CNN
    feature maps (same fixed-seed embedder family as utils/fid.py), the
    LPIPS recipe with untrained weights. Correlates with perceptual
    distance for ranking; absolute values are NOT comparable to published
    AlexNet-LPIPS numbers — report as `lpips_rf`.
    """
    from .fid import RandomFeatureEmbedder

    emb = getattr(lpips_rf, "_emb", None)
    if emb is None:
        emb = RandomFeatureEmbedder(seed=0)
        lpips_rf._emb = emb

    def prep(x):
        x = np.asarray(x, np.float32)
        if x.ndim == 2:
            x = x[..., None]
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        if x.max() > 1.5:
            x = x / 255.0
        return np.transpose(x, (2, 0, 1))[None]

    fa = emb(prep(a))[0]
    fb = emb(prep(b))[0]
    fa = fa / (np.linalg.norm(fa) + 1e-10)
    fb = fb / (np.linalg.norm(fb) + 1e-10)
    return float(np.sum((fa - fb) ** 2))


def lpips_distance(a: np.ndarray, b: np.ndarray):
    """LPIPS (AlexNet) if the optional `lpips` package is present, else None.

    The environment has no lpips wheel; callers treat None as 'unavailable'
    and the CSV reports it as such (Measure.py uses lpips alexnet). For an
    in-env perceptual metric use `lpips_rf` / Measure(lpips_substitute=True).
    """
    try:
        import lpips  # type: ignore
        import torch
    except ImportError:
        return None
    model = lpips_distance._model if hasattr(lpips_distance, "_model") else None
    if model is None:
        model = lpips.LPIPS(net="alex")
        lpips_distance._model = model

    def t(x):
        x = torch.tensor(np.asarray(x, np.float32) / 127.5 - 1.0)
        return x.permute(2, 0, 1)[None]

    with torch.no_grad():
        return float(model(t(a), t(b)).item())


class Measure:
    """PSNR/SSIM/LPIPS triple like the reference Measure.py.

    lpips_substitute=True reports the random-feature perceptual distance
    (`lpips_rf`) when the real lpips package is absent, instead of None.
    lpips_proxy=True prefers the TRAINED-feature proxy
    (utils/perceptual.lpips_proxy, checked-in conv weights) over lpips_rf.
    """

    def __init__(self, lpips_substitute: bool = False,
                 lpips_proxy: bool = False):
        self.lpips_substitute = lpips_substitute
        self.lpips_proxy = lpips_proxy

    def measure(self, img_a: np.ndarray, img_b: np.ndarray):
        lp = lpips_distance(img_a, img_b)
        if lp is None and self.lpips_proxy:
            from .perceptual import lpips_proxy
            lp = lpips_proxy(img_a, img_b)
        elif lp is None and self.lpips_substitute:
            lp = lpips_rf(img_a, img_b)
        return psnr(img_a, img_b), ssim(img_a, img_b), lp


def lr_consistency_psnr(sr: np.ndarray, lr: np.ndarray, scale: int) -> float:
    """PSNR between bicubic-downscaled SR and the input LR (test.py:153)."""
    down = imresize(sr.astype(np.float64), 1.0 / scale)
    return psnr(np.clip(down, 0, 255), lr)
