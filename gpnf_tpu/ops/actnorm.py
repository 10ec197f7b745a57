"""ActNorm: per-channel affine with data-dependent initialization.

Reference: flow_modules/common_modules.py:130-187 (`Actnormlayer`) and
models/modules/FlowActNorms.py. The reference mutates its parameters inside
the first forward pass; that pattern does not survive `jax.jit`, so here the
data-dependent init is an explicit `ddi(params, x)` pass run once, eagerly,
on a prototype batch before the train step is compiled (SURVEY.md §7.3-3).

logdet convention: ldj = sum(logs) * H * W, added on forward, subtracted on
inverse — identical to the reference (common_modules.py:167).
"""
from __future__ import annotations

import jax.numpy as jnp


class ActNorm:
    def __init__(self, num_channels: int, scale: float = 1.0, eps: float = 1e-6):
        self.num_channels = num_channels
        self.scale = float(scale)
        self.eps = eps

    def init(self, key):
        del key
        return {
            "bias": jnp.zeros((self.num_channels,)),
            "logs": jnp.zeros((self.num_channels,)),
        }

    def _ldj(self, params, x):
        h, w = x.shape[2], x.shape[3]
        return jnp.sum(params["logs"]) * (h * w)

    def forward(self, params, x, logdet, **_):
        bias = params["bias"].reshape(1, -1, 1, 1)
        logs = params["logs"].reshape(1, -1, 1, 1)
        y = (x + bias) * jnp.exp(logs)
        return y, logdet + self._ldj(params, x)

    def inverse(self, params, y, logdet, **_):
        bias = params["bias"].reshape(1, -1, 1, 1)
        logs = params["logs"].reshape(1, -1, 1, 1)
        x = y * jnp.exp(-logs) - bias
        return x, logdet - self._ldj(params, y)

    def ddi(self, params, x, logdet):
        """Data-dependent init: zero mean, `scale` std per channel post-transform."""
        mean = jnp.mean(x, axis=(0, 2, 3))
        var = jnp.mean((x - mean.reshape(1, -1, 1, 1)) ** 2, axis=(0, 2, 3))
        logs = jnp.log(self.scale / (jnp.sqrt(var) + self.eps))
        params = {"bias": -mean, "logs": logs}
        y, logdet = self.forward(params, x, logdet)
        return params, y, logdet


class MaskedActNorm:
    """ActNorm applied only where a binary mask is set; log-det counts only
    masked positions. Reference: models/modules/FlowActNorms.py:128-140
    (`MaskedActNorm2d`)."""

    def __init__(self, num_channels: int, scale: float = 1.0):
        self.inner = ActNorm(num_channels, scale)

    def init(self, key):
        return self.inner.init(key)

    def forward(self, params, x, logdet, *, mask, **_):
        y, _ = self.inner.forward(params, x, jnp.zeros_like(logdet))
        out = jnp.where(mask, y, x)
        logs = params["logs"].reshape(1, -1, 1, 1)
        ldj = jnp.sum((logs * mask.astype(x.dtype)).reshape(x.shape[0], -1), axis=-1)
        return out, logdet + ldj

    def inverse(self, params, y, logdet, *, mask, **_):
        x, _ = self.inner.inverse(params, y, jnp.zeros_like(logdet))
        out = jnp.where(mask, x, y)
        logs = params["logs"].reshape(1, -1, 1, 1)
        ldj = jnp.sum((logs * mask.astype(y.dtype)).reshape(y.shape[0], -1), axis=-1)
        return out, logdet - ldj
