"""Fréchet distance machinery for FID-style evaluation.

The reference reports FID on CIFAR10 (README.md:52) computed with an
InceptionV3 embedder. Inception weights are not bundled in this zero-egress
environment, so the embedder is pluggable: pass any `embed_fn(images_u8_nchw)
-> (N, D)` (e.g. a transformers ViT, or a trained RRDB trunk). The Fréchet
computation itself (Gaussian moment matching, matrix sqrt via eigen-
decomposition of the symmetrized product) is exact.
"""
from __future__ import annotations

from typing import Callable, Iterable

import numpy as np


def gaussian_stats(features: np.ndarray):
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^{1/2}), eigval-based sqrtm."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1) + eps * np.eye(len(mu1))
    sigma2 = np.atleast_2d(sigma2) + eps * np.eye(len(mu2))

    diff = mu1 - mu2
    # sqrt of S1 S2 via S1^{1/2} S2 S1^{1/2} (symmetric PSD)
    w1, v1 = np.linalg.eigh(sigma1)
    sqrt_s1 = (v1 * np.sqrt(np.clip(w1, 0, None))) @ v1.T
    inner = sqrt_s1 @ sigma2 @ sqrt_s1
    w, _ = np.linalg.eigh(inner)
    tr_sqrt = np.sum(np.sqrt(np.clip(w, 0, None)))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_sqrt)


def fid_between(embed_fn: Callable[[np.ndarray], np.ndarray],
                real_batches: Iterable[np.ndarray],
                fake_batches: Iterable[np.ndarray]) -> float:
    def collect(batches):
        feats = [np.asarray(embed_fn(b)) for b in batches]
        return np.concatenate(feats, axis=0)

    mu_r, s_r = gaussian_stats(collect(real_batches))
    mu_f, s_f = gaussian_stats(collect(fake_batches))
    return frechet_distance(mu_r, s_r, mu_f, s_f)


def pixel_embed(images: np.ndarray, downsample: int = 4) -> np.ndarray:
    """Weak default embedder: mean-pooled pixels (useful for smoke tests and
    relative comparisons; NOT comparable to published Inception-FID)."""
    n, c, h, w = images.shape
    x = images.astype(np.float64).reshape(
        n, c, h // downsample, downsample, w // downsample, downsample
    ).mean((3, 5))
    return x.reshape(n, -1)
