"""Invertible attention ablation variants.

Reference: flow_modules/spatial_attn.py (`_Spatial_first_order_attn`, iMap
attention, 5-95) and flow_modules/elementwise_attention.py
(`Elementwise_channel_exp`, 8-65); catalogued with the transformer variants
in flow_modules/Flow_attentions.py (SURVEY.md §2.1).

The head-count / scoring transformer ablations (transformer_x3/x5/x7/_8,
*_sig) are constructor presets of `InvertibleAttention` — see
`make_transformer_variant`.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .attention import InvertibleAttention
from .basic import sum_except_batch
from .conv import conv2d

EPS = 1e-6


def make_transformer_variant(num_channels: int, variant: str) -> InvertibleAttention:
    """Presets matching the reference ablation files.

    'sdp_3h' = ACTIVE config (transformer.py); 'x3' = 3-head SOFTMAX score,
    scale 2000, diag offset 1.01 (transformer_x3.py:110-116,176-179);
    'srflow' = the SRFlow-side 5-head softmax variant
    (models/modules/transformer.py:110-116,137-152); 'x5'/'x7'/'8' = 5/7/8
    sigmoid q,k heads (transformer_x5/x7/_8.py).
    """
    presets = {
        "sdp_3h": dict(num_heads=3),
        "x3": dict(num_heads=3, score="softmax", offset_init=1.01,
                   scale_init=2000.0),
        "srflow": dict(num_heads=5, score="softmax", offset_init=1.01,
                       scale_init=2000.0),
        "x5": dict(num_heads=5),
        "x7": dict(num_heads=7),
        "8": dict(num_heads=8),
    }
    return InvertibleAttention(num_channels, **presets[variant])


class SpatialFirstOrderAttention:
    """iMap attention: masked 1x1 channel conv -> channel avg-pool -> per-
    position sigmoid scale on the unmasked half; per-channel sigmoid scale on
    the masked half. Exactly invertible, elementwise-diagonal Jacobian.

    mask[c, n] = 1 iff (c + n) odd over channels x flattened pixels
    (spatial_attn.py:24-30); `permute` flips it.
    """

    def __init__(self, num_channels: int, offset_init: float = 8.0):
        self.nc = num_channels
        self.offset_init = offset_init

    def init(self, key):
        kw, kb, ks = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(self.nc)
        return {
            "weight": jax.random.uniform(kw, (self.nc, self.nc),
                                         minval=-bound, maxval=bound),
            "bias": jax.random.uniform(kb, (self.nc,), minval=-bound, maxval=bound),
            "s": jax.random.normal(ks, (1, self.nc, 1)),
            "offset": jnp.full((1,), self.offset_init),
        }

    @staticmethod
    def _mask(c, n, permute):
        cc = np.arange(c)[:, None]
        nn = np.arange(n)[None, :]
        m = ((cc + nn) % 2 == 1).astype(np.float32)
        if permute:
            m = 1.0 - m
        return jnp.asarray(m)[None]  # (1, C, N)

    def _scales(self, params, x_masked_flat):
        """Per-position gate from the masked input. x_masked_flat (B, C, N)."""
        z = jnp.einsum("oc,bcn->bon", params["weight"], x_masked_flat,
                       preferred_element_type=jnp.float32)
        z = z + params["bias"][None, :, None]
        pool = jnp.mean(z, axis=1)  # (B, N) channel avg-pool
        gate = jax.nn.sigmoid(pool + params["offset"][0]) + EPS
        s_sig = jax.nn.sigmoid(params["s"]) + EPS  # (1, C, 1)
        return gate[:, None, :], s_sig

    def _ldj(self, params, gate, mask):
        # (C/2) per position for the unmasked half + constant masked-half term
        per_pos = (self.nc // 2) * jnp.log(gate[:, 0, :])
        s_sig = jax.nn.sigmoid(params["s"]) + EPS
        const = jnp.sum(jnp.log(s_sig) * mask)
        return jnp.sum(per_pos, axis=-1) + const

    def forward(self, params, x, logdet, *, permute=False, **_):
        b, c, h, w = x.shape
        xf = x.reshape(b, c, h * w)
        mask = self._mask(c, h * w, permute)
        gate, s_sig = self._scales(params, xf * mask)
        y = xf * ((1.0 - mask) * gate + mask * s_sig)
        logdet = logdet + self._ldj(params, gate, mask)
        return y.reshape(b, c, h, w), logdet

    def inverse(self, params, y, logdet, *, permute=False, **_):
        b, c, h, w = y.shape
        yf = y.reshape(b, c, h * w)
        mask = self._mask(c, h * w, permute)
        s_sig = jax.nn.sigmoid(params["s"]) + EPS
        x_masked = yf * mask / s_sig
        gate, _ = self._scales(params, x_masked)
        xf = yf * (1.0 - mask) / gate + x_masked * mask
        logdet = logdet - self._ldj(params, gate, mask)
        return xf.reshape(b, c, h, w), logdet


class ElementwiseChannelAttention:
    """Random-binary-mask gated scaling (elementwise_attention.py:8-65):
    gate = sigmoid(conv1x1(x*mask) + channel_offset) + 1e-3 scales the
    unmasked elements; logdet = sum log gate over unmasked positions.

    The binary mask is drawn once at init (the reference re-rolls via
    init_mask); pass `mask_key` for a different pattern.
    """

    def __init__(self, num_channels: int, shape, *, mask_key=None,
                 offset_init: float = 8.0):
        self.nc = num_channels
        c, h, w = shape
        key = mask_key if mask_key is not None else jax.random.PRNGKey(0)
        self.mask = np.asarray(
            jax.random.uniform(key, (c, h, w)) > 0.5, dtype=np.float32)[None]
        self.offset_init = offset_init

    def init(self, key):
        bound = 1.0 / np.sqrt(self.nc)
        return {
            "weight": jax.random.uniform(key, (self.nc, self.nc, 1, 1),
                                         minval=-bound, maxval=bound),
            "channel_offset": jnp.full((1, self.nc, 1, 1), self.offset_init),
        }

    def _gate(self, params, x_masked):
        out = conv2d(x_masked, params["weight"]) + params["channel_offset"]
        return jax.nn.sigmoid(out) + 1e-3

    def forward(self, params, x, logdet, **_):
        mask = jnp.asarray(self.mask)
        gate = self._gate(params, x * mask)
        y = x * (1.0 - mask) * gate + x * mask
        logdet = logdet + sum_except_batch(jnp.log(gate) * (1.0 - mask))
        return y, logdet

    def inverse(self, params, y, logdet, **_):
        mask = jnp.asarray(self.mask)
        gate = self._gate(params, y * mask)
        x = (y * (1.0 - mask)) / gate * (1.0 - mask) + y * mask
        logdet = logdet - sum_except_batch(jnp.log(gate) * (1.0 - mask))
        return x, logdet
