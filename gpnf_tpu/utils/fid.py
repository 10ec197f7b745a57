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


class RandomFeatureEmbedder:
    """Fixed-seed random CNN embedder (the in-env stand-in for InceptionV3).

    Inception weights cannot be fetched in this zero-egress image, so this
    provides a *deterministic* untrained conv feature extractor: 4 stages of
    (3x3 conv, leaky-relu, 2x2 avg-pool), concatenating each stage's global
    average pool. Random-CNN Fréchet distances are known to correlate well
    with Inception-FID for ranking models, but the absolute numbers are NOT
    comparable to published FID values — report them as `fid_rf`.

    Deterministic: weights derive from PRNGKey(seed) only, so numbers are
    reproducible across runs/machines.
    """

    def __init__(self, seed: int = 0, widths=(64, 128, 256, 256)):
        import jax
        import jax.numpy as jnp

        from ..ops.conv import conv2d

        key = jax.random.PRNGKey(seed)
        ws = []
        c_in = 3
        for w_out in widths:
            key, k = jax.random.split(key)
            std = float(np.sqrt(2.0 / (c_in * 9)))
            ws.append(jax.random.normal(k, (w_out, c_in, 3, 3)) * std)
            c_in = w_out
        self._weights = ws
        self.dim = sum(widths)

        def embed(x):  # x: (N, 3, H, W) float in [0, 1]
            x = x * 2.0 - 1.0
            feats = []
            for w in ws:
                x = jax.nn.leaky_relu(conv2d(x, w), 0.2)
                feats.append(jnp.mean(x, axis=(2, 3)))
                x = jax.lax.reduce_window(
                    x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                ) * 0.25
            return jnp.concatenate(feats, axis=-1)

        self._embed = jax.jit(embed)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: (N, C, H, W) uint8 or float. Returns (N, D) float64."""
        x = np.asarray(images)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        if x.shape[1] == 1:
            x = np.repeat(x, 3, axis=1)
        return np.asarray(self._embed(x)).astype(np.float64)


def fid_rf(real_batches: Iterable[np.ndarray],
           fake_batches: Iterable[np.ndarray], *, seed: int = 0) -> float:
    """Random-feature FID between two image sets (see RandomFeatureEmbedder)."""
    return fid_between(RandomFeatureEmbedder(seed=seed), real_batches,
                       fake_batches)
