"""Invertible video/channel attention family (token form).

Reference capability surface: flow_modules/Flow_attentions.py —
`_Temporal_second_order_attn` (596), `_Channel_second_order_attn` (678),
`_Temporal_first_order_attn` (758), `_Channel_first_order_attn` (831) — and
the video attention ops in the dead NAS layer (operations.py:66-392,
SURVEY.md §2.6). The reference prototypes are not exactly invertible: their
reverse pass drops same-parity cross-token terms and their log-det uses only
the attention diagonal (Flow_attentions.py:640-648,671-676). Here the family
is re-derived in the same parity-block form as `ops/attention.py`, which
makes forward, inverse, and log-det exact:

  tokens x in (B, N, D) with element mask M[n,d] = (n+d) even; q/k are
  per-head (D,D) mixings of the masked tokens; scores restricted to
  same-parity token pairs give two mixing blocks m1 (even tokens) and
  m2 (odd), each + offset*I; unmasked elements transform as y[E,d]=m1@x[E,d]
  (d odd) / y[O,d]=m2@x[O,d] (d even); logdet = (slogdet m1 + slogdet m2)*D/2.

Token axes: Temporal -> frames (D = C*H*W), Channel -> channels (D = H*W),
SpatioTemporal -> frame-patches.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .attention import checkerboard


class TokenInvertibleAttention:
    """Exact invertible attention over a generic token axis."""

    def __init__(self, dim: int, num_heads: int = 1, *, offset_init: float = 0.99,
                 offset2_init: float = 0.65, offset3_init: float = -0.6,
                 scale_init: float = 100.0):
        self.dim = dim
        self.num_heads = num_heads
        self.inits = (offset_init, offset2_init, offset3_init, scale_init)

    def init(self, key):
        o1, o2, o3, sc = self.inits
        ks = jax.random.split(key, 2 * self.num_heads)
        bound = np.sqrt(1.0 / self.dim)
        wq = jnp.stack([jax.random.uniform(k, (self.dim, self.dim),
                                           minval=-bound, maxval=bound)
                        for k in ks[: self.num_heads]])
        wk = jnp.stack([jax.random.uniform(k, (self.dim, self.dim),
                                           minval=-bound, maxval=bound)
                        for k in ks[self.num_heads :]])
        return {"wq": wq, "wk": wk,
                "offset": jnp.full((1,), o1), "offset2": jnp.full((1,), o2),
                "offset3": jnp.full((1,), o3), "scale": jnp.full((1,), sc)}

    def _blocks(self, params, x_masked):
        # x_masked: (B, N, D); per-head q/k mixings over D
        q = jnp.einsum("hod,bnd->bhno", params["wq"], x_masked,
                       preferred_element_type=jnp.float32)
        k = jnp.einsum("hod,bnd->bhno", params["wk"], x_masked,
                       preferred_element_type=jnp.float32)
        scores = jnp.einsum("bhno,bhmo->bnm", q, k,
                            preferred_element_type=jnp.float32) / params["scale"][0]
        a = jax.nn.sigmoid(scores + params["offset2"][0]) + params["offset3"][0]
        n = x_masked.shape[1]
        even, odd = np.arange(0, n, 2), np.arange(1, n, 2)
        eye = jnp.eye(n // 2, dtype=a.dtype) * params["offset"][0]
        m1 = a[:, even[:, None], even[None, :]] + eye
        m2 = a[:, odd[:, None], odd[None, :]] + eye
        return m1, m2

    def forward_tokens(self, params, x, logdet, *, permute=False):
        b, n, d = x.shape
        mask = jnp.asarray(checkerboard((n, d)))
        if permute:
            mask = 1.0 - mask
        xm = x * mask
        m1, m2 = self._blocks(params, xm)
        logdet = logdet + (jnp.linalg.slogdet(m1)[1]
                           + jnp.linalg.slogdet(m2)[1]) * (d // 2)
        even, odd = np.arange(0, n, 2), np.arange(1, n, 2)
        u = x * (1.0 - mask)
        y_e = jnp.einsum("bij,bjd->bid", m1, u[:, even],
                         preferred_element_type=jnp.float32).astype(x.dtype)
        y_o = jnp.einsum("bij,bjd->bid", m2, u[:, odd],
                         preferred_element_type=jnp.float32).astype(x.dtype)
        yu = jnp.zeros_like(x).at[:, even].set(y_e).at[:, odd].set(y_o)
        return yu * (1.0 - mask) + xm, logdet

    def inverse_tokens(self, params, y, logdet, *, permute=False):
        b, n, d = y.shape
        mask = jnp.asarray(checkerboard((n, d)))
        if permute:
            mask = 1.0 - mask
        ym = y * mask
        m1, m2 = self._blocks(params, ym)
        logdet = logdet - (jnp.linalg.slogdet(m1)[1]
                           + jnp.linalg.slogdet(m2)[1]) * (d // 2)
        even, odd = np.arange(0, n, 2), np.arange(1, n, 2)
        u = y * (1.0 - mask)
        x_e = jnp.linalg.solve(m1, u[:, even]).astype(y.dtype)
        x_o = jnp.linalg.solve(m2, u[:, odd]).astype(y.dtype)
        xu = jnp.zeros_like(y).at[:, even].set(x_e).at[:, odd].set(x_o)
        return xu * (1.0 - mask) + ym, logdet


class TemporalInvertibleAttention(TokenInvertibleAttention):
    """Frames attend to same-parity frames; input (B, T, C, H, W)."""

    def forward(self, params, x, logdet, *, permute=False, **_):
        b, t, c, h, w = x.shape
        y, logdet = self.forward_tokens(params, x.reshape(b, t, c * h * w),
                                        logdet, permute=permute)
        return y.reshape(x.shape), logdet

    def inverse(self, params, y, logdet, *, permute=False, **_):
        b, t, c, h, w = y.shape
        x, logdet = self.inverse_tokens(params, y.reshape(b, t, c * h * w),
                                        logdet, permute=permute)
        return x.reshape(y.shape), logdet


class ChannelInvertibleAttention(TokenInvertibleAttention):
    """Channels attend to same-parity channels; input (B, C, H, W)."""

    def forward(self, params, x, logdet, *, permute=False, **_):
        b, c, h, w = x.shape
        y, logdet = self.forward_tokens(params, x.reshape(b, c, h * w),
                                        logdet, permute=permute)
        return y.reshape(x.shape), logdet

    def inverse(self, params, y, logdet, *, permute=False, **_):
        b, c, h, w = y.shape
        x, logdet = self.inverse_tokens(params, y.reshape(b, c, h * w),
                                        logdet, permute=permute)
        return x.reshape(y.shape), logdet


class SpatioTemporalInvertibleAttention(TokenInvertibleAttention):
    """Frame-level spatial halves as tokens: (B, T, C, H, W) with tokens
    T*2 (top/bottom half per frame), covering the SpatioTemporal_map/dot
    capability of operations.py:66-392."""

    def forward(self, params, x, logdet, *, permute=False, **_):
        b, t, c, h, w = x.shape
        tok = x.reshape(b, t * 2, c * (h // 2) * w)
        y, logdet = self.forward_tokens(params, tok, logdet, permute=permute)
        return y.reshape(x.shape), logdet

    def inverse(self, params, y, logdet, *, permute=False, **_):
        b, t, c, h, w = y.shape
        tok = y.reshape(b, t * 2, c * (h // 2) * w)
        x, logdet = self.inverse_tokens(params, tok, logdet, permute=permute)
        return x.reshape(y.shape), logdet


class TokenFirstOrderAttention:
    """First-order (iMap-style) gating over a token axis: masked mixing ->
    token avg-pool -> per-dim sigmoid gate on unmasked elements, per-token
    sigmoid scale on masked ones. Diagonal Jacobian, exact.

    Covers `_Temporal_first_order_attn` / `_Channel_first_order_attn`
    (Flow_attentions.py:758,831) with the spatial variant's proven math
    (ops/attention_variants.py:SpatialFirstOrderAttention).
    """

    EPS = 1e-6

    def __init__(self, n_tokens: int, offset_init: float = 8.0):
        self.n_tokens = n_tokens
        self.offset_init = offset_init

    def init(self, key):
        kw, kb, ks = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(self.n_tokens)
        return {
            "weight": jax.random.uniform(kw, (self.n_tokens, self.n_tokens),
                                         minval=-bound, maxval=bound),
            "bias": jax.random.uniform(kb, (self.n_tokens,), minval=-bound,
                                       maxval=bound),
            "s": jax.random.normal(ks, (1, self.n_tokens, 1)),
            "offset": jnp.full((1,), self.offset_init),
        }

    def _mask(self, n, d, permute):
        m = 1.0 - checkerboard((n, d))
        if permute:
            m = 1.0 - m
        return jnp.asarray(m)[None]

    def _gates(self, params, x_masked):
        z = jnp.einsum("on,bnd->bod", params["weight"], x_masked,
                       preferred_element_type=jnp.float32)
        z = z + params["bias"][None, :, None]
        pool = jnp.mean(z, axis=1)  # (B, D)
        gate = jax.nn.sigmoid(pool + params["offset"][0]) + self.EPS
        s_sig = jax.nn.sigmoid(params["s"]) + self.EPS
        return gate[:, None, :], s_sig

    def _ldj(self, params, gate, mask):
        n = mask.shape[1]
        per_dim = (n // 2) * jnp.log(gate[:, 0, :])
        s_sig = jax.nn.sigmoid(params["s"]) + self.EPS
        const = jnp.sum(jnp.log(s_sig) * mask)
        return jnp.sum(per_dim, axis=-1) + const

    def forward_tokens(self, params, x, logdet, *, permute=False):
        b, n, d = x.shape
        mask = self._mask(n, d, permute)
        gate, s_sig = self._gates(params, x * mask)
        y = x * ((1.0 - mask) * gate + mask * s_sig)
        return y, logdet + self._ldj(params, gate, mask)

    def inverse_tokens(self, params, y, logdet, *, permute=False):
        b, n, d = y.shape
        mask = self._mask(n, d, permute)
        s_sig = jax.nn.sigmoid(params["s"]) + self.EPS
        xm = y * mask / s_sig
        gate, _ = self._gates(params, xm)
        x = y * (1.0 - mask) / gate + xm * mask
        return x, logdet - self._ldj(params, gate, mask)


class TemporalFirstOrderAttention(TokenFirstOrderAttention):
    def forward(self, params, x, logdet, *, permute=False, **_):
        b, t, c, h, w = x.shape
        y, logdet = self.forward_tokens(params, x.reshape(b, t, -1), logdet,
                                        permute=permute)
        return y.reshape(x.shape), logdet

    def inverse(self, params, y, logdet, *, permute=False, **_):
        b, t, c, h, w = y.shape
        x, logdet = self.inverse_tokens(params, y.reshape(b, t, -1), logdet,
                                        permute=permute)
        return x.reshape(y.shape), logdet


class ChannelFirstOrderAttention(TokenFirstOrderAttention):
    def forward(self, params, x, logdet, *, permute=False, **_):
        b, c, h, w = x.shape
        y, logdet = self.forward_tokens(params, x.reshape(b, c, -1), logdet,
                                        permute=permute)
        return y.reshape(x.shape), logdet

    def inverse(self, params, y, logdet, *, permute=False, **_):
        b, c, h, w = y.shape
        x, logdet = self.inverse_tokens(params, y.reshape(b, c, -1), logdet,
                                        permute=permute)
        return x.reshape(y.shape), logdet
