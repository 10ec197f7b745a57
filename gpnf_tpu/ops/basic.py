"""Shape-shuffling bijectors and diagonal-Gaussian base density.

Reference semantics: /root/reference/flow_modules/common_modules.py
(squeeze2d/unsqueeze2d 12-42, SqueezeLayer 44-55, Split2dMsC 189-208,
TupleFlip 210-220, GaussianDiag 223-240) re-designed as pure JAX functions.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG2PI = math.log(2.0 * math.pi)


def sum_except_batch(x: jax.Array) -> jax.Array:
    """Reduce all axes but the leading batch axis -> (B,)."""
    return jnp.sum(x.reshape(x.shape[0], -1), axis=-1)


def split_channels(x: jax.Array, kind: str = "split"):
    """Channel split along axis 1: "split" = halves, "cross" = even/odd strides.

    Matches `split_feature` (flow_modules/affine_coupling.py:83-91).
    """
    c = x.shape[1]
    if kind == "split":
        return x[:, : c // 2], x[:, c // 2 :]
    if kind == "cross":
        return x[:, 0::2], x[:, 1::2]
    raise ValueError(f"unknown split kind {kind!r}")


def squeeze2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Space-to-depth with the Glow channel ordering (c, fh, fw).

    (B,C,H,W) -> (B, C*f*f, H/f, W/f); zero log-det (pure permutation).
    """
    if factor == 1:
        return x
    b, c, h, w = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    x = x.reshape(b, c, h // factor, factor, w // factor, factor)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, c * factor * factor, h // factor, w // factor)


def unsqueeze2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Inverse of squeeze2d."""
    if factor == 1:
        return x
    b, c, h, w = x.shape
    f2 = factor * factor
    assert c % f2 == 0, c
    x = x.reshape(b, c // f2, factor, factor, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, c // f2, h * factor, w * factor)


class Squeeze:
    """SqueezeLayer: zero-parameter, zero-logdet reshape bijector."""

    def __init__(self, factor: int = 2):
        self.factor = factor

    def init(self, key):
        del key
        return {}

    def forward(self, params, x, logdet, **_):
        del params
        return squeeze2d(x, self.factor), logdet

    def inverse(self, params, y, logdet, **_):
        del params
        return unsqueeze2d(y, self.factor), logdet


class TupleFlip:
    """Swap channel halves (used after MixLogCDF couplings).

    Reference: common_modules.py:210-220. Note the reference applies the same
    concat([z2, z1]) in both directions, which is its own inverse only because
    the two halves have equal size; we keep that exact behavior.
    """

    def init(self, key):
        del key
        return {}

    @staticmethod
    def _flip(x):
        z1, z2 = jnp.split(x, 2, axis=1)
        return jnp.concatenate([z2, z1], axis=1)

    def forward(self, params, x, logdet, **_):
        del params
        return self._flip(x), logdet

    def inverse(self, params, y, logdet, **_):
        del params
        return self._flip(y), logdet


class GaussianDiag:
    """Diagonal Gaussian log-density / sampling (common_modules.py:223-240)."""

    @staticmethod
    def likelihood(mean, logs, x):
        if mean is None:  # standard normal branch (models/modules/flow.py:96-97)
            return -0.5 * (x**2 + LOG2PI)
        return -0.5 * (logs * 2.0 + ((x - mean) ** 2) * jnp.exp(-2.0 * logs) + LOG2PI)

    @staticmethod
    def logp(mean, logs, x):
        return sum_except_batch(GaussianDiag.likelihood(mean, logs, x))

    @staticmethod
    def sample(key, mean, logs, eps_std=None):
        eps_std = 1.0 if eps_std is None else eps_std
        eps = jax.random.normal(key, mean.shape, mean.dtype) * eps_std
        return mean + jnp.exp(logs) * eps

    @staticmethod
    def sample_eps(key, shape, eps_std=None, dtype=jnp.float32):
        eps_std = 1.0 if eps_std is None else eps_std
        return jax.random.normal(key, shape, dtype) * eps_std
