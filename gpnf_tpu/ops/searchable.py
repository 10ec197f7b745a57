"""Searchable conv op library: slimmable widths + int8 fake-quant (NAS layer).

Reference: operations.py:832-1768 — `Conv`, `ConvNorm`, `Conv3x3`, `Conv7x7`,
`BasicResidual`, `DwsBlock`, `SkipConnect` and the `OPS` registry, built on
slimmable `USConv2d`/`USBatchNorm2d` (imported there from a missing
`slimmable_ops` module) and a missing `quantize.QConv2d`. The reference runs
with ENABLE_BN = False (operations.py:60), so the live op surface is
conv->relu chains; BN is kept here as an opt-in batch-stat norm.

TPU-first redesign decisions:
- **Slimmable width = channel masking, not weight slicing.** The reference's
  USConv2d slices `weight[:c_out, :c_in]` per sampled ratio — dynamic shapes,
  which XLA cannot compile efficiently (one program per width). Here every
  op computes at FULL static width and multiplies by a 0/1 channel mask
  (`iota < c_active`, c_active a traced scalar). Outputs for active channels
  are bitwise identical to slicing (inactive inputs are zero and masked
  weights see zero activations), shapes stay static, and one XLA program
  serves every width. FLOPs accounting uses the *sliced* widths analytically,
  so the search still sees the true cost of a width choice.
- **Quantization = int8 symmetric fake-quant with a straight-through
  estimator** (per-tensor absmax scale), standing in for the missing
  `quantize` module: search-time Q-cost modeling, not a deployment format.
- **FLOPs come from XLA's cost analysis** (`xla_op_flops`), replacing the
  reference's thop + .npy lookup tables (operations.py:34-52) with the
  compiler's own count; an analytic fallback covers the non-compiled path.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp

from .convrnn import _convnd


def make_divisible(v: float, divisor: int = 1, min_value: int = 1) -> int:
    """Slimmable-networks width rounding. The reference imports this from the
    absent `slimmable_ops`; the standard definition rounds to the nearest
    multiple of `divisor` (>= min_value)."""
    return max(min_value, int(v + divisor / 2) // divisor * divisor)


def fake_quant_int8(x: jax.Array) -> jax.Array:
    """Symmetric per-tensor int8 fake quantization with STE gradient."""
    scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127) * scale
    return x + jax.lax.stop_gradient(q - x)


def channel_mask(c_total: int, c_active, dtype=jnp.float32) -> jax.Array:
    """(1, C, 1, 1) mask keeping the first c_active channels (traced ok)."""
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, c_total, 1, 1), 1)
    return (ids < c_active).astype(dtype)


def _kaiming_uniform(key, out_ch, in_ch, k):
    bound = 1.0 / math.sqrt(max(1, in_ch * k * k))
    return jax.random.uniform(key, (out_ch, in_ch, k, k), minval=-bound,
                              maxval=bound)


class USConv2d:
    """Universally-slimmable conv: full-width compute + in/out channel masks.

    `apply(params, x, ratio=(in_r, out_r), quantize=False)`; each ratio may be
    a python float or a traced scalar (from gumbel width sampling)."""

    def __init__(self, c_in, c_out, k=3, stride=1, dilation=1, groups=1,
                 bias=False):
        self.c_in, self.c_out, self.k = c_in, c_out, k
        self.stride, self.dilation, self.groups = stride, dilation, groups
        self.bias = bias

    def init(self, key):
        p = {"w": _kaiming_uniform(key, self.c_out, self.c_in // self.groups,
                                   self.k)}
        if self.bias:
            p["b"] = jnp.zeros((self.c_out,))
        return p

    def _active(self, ratio):
        def act(c, r):
            if isinstance(r, (int, float)):
                return make_divisible(c * float(r))
            return jnp.maximum(1, jnp.floor(c * r + 0.5)).astype(jnp.int32)
        return act(self.c_in, ratio[0]), act(self.c_out, ratio[1])

    def apply(self, params, x, ratio=(1.0, 1.0), quantize=False):
        a_in, a_out = self._active(ratio)
        w = params["w"]
        if quantize:
            w = fake_quant_int8(w)
            x = fake_quant_int8(x)
        x = x * channel_mask(self.c_in, a_in, x.dtype)
        y = _convnd(x, w, params.get("b"), dilation=self.dilation, ndim=2,
                    groups=self.groups, stride=self.stride)
        return y * channel_mask(self.c_out, a_out, y.dtype)

    def flops(self, size, ratio=(1.0, 1.0)):
        """Analytic MACs*2 at the SLICED widths, (c,h,w) in -> out size."""
        c_in, h, w = size
        a_in = make_divisible(self.c_in * float(ratio[0]))
        a_out = make_divisible(self.c_out * float(ratio[1]))
        h_o, w_o = h // self.stride, w // self.stride
        fl = 2 * a_in * a_out * self.k * self.k * h_o * w_o // self.groups
        return fl, (a_out, h_o, w_o)


def batch_norm_stateless(x, eps=1e-5):
    """Per-batch BN (no running stats) for the opt-in ENABLE_BN path."""
    mu = jnp.mean(x, axis=(0, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(0, 2, 3), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class _OpBase:
    enable_bn = False  # reference operations.py:60

    def _norm(self, x):
        return batch_norm_stateless(x) if self.enable_bn else x


class ConvOp(_OpBase):
    """Bare slimmable conv, no activation (reference `Conv`, 832-938)."""

    def __init__(self, c_in, c_out, k=3, stride=1, dilation=1, groups=1,
                 bias=False):
        self.conv = USConv2d(c_in, c_out, k, stride, dilation, groups, bias)

    def init(self, key):
        return {"conv": self.conv.init(key)}

    def apply(self, params, x, ratio=(1.0, 1.0), quantize=False):
        return self.conv.apply(params["conv"], x, ratio, quantize)

    def flops(self, size, ratio=(1.0, 1.0)):
        return self.conv.flops(size, ratio)


class Conv3x3(_OpBase):
    """conv3x3 (+optional dilation) -> [bn] -> relu (reference 1259-1358)."""

    def __init__(self, c_in, c_out, k=3, stride=1, dilation=1, groups=1):
        if stride == 2:
            dilation = 1
        self.conv = USConv2d(c_in, c_out, 3, stride, dilation, groups)

    def init(self, key):
        return {"conv": self.conv.init(key)}

    def apply(self, params, x, ratio=(1.0, 1.0), quantize=False):
        y = self.conv.apply(params["conv"], x, ratio, quantize)
        return jax.nn.relu(self._norm(y))

    def flops(self, size, ratio=(1.0, 1.0)):
        return self.conv.flops(size, ratio)


class Conv7x7(_OpBase):
    """7x7 variant (reference 1165-1257)."""

    def __init__(self, c_in, c_out, k=7, stride=1, dilation=1, groups=1):
        if stride == 2:
            dilation = 1
        self.conv = USConv2d(c_in, c_out, 7, stride, dilation, groups)

    init = Conv3x3.init
    apply = Conv3x3.apply
    flops = Conv3x3.flops


class BasicResidual(_OpBase):
    """conv3x3-relu-conv3x3 + (1x1 skip when shape changes), final relu
    (reference 1360-1491)."""

    def __init__(self, c_in, c_out, k=3, stride=1, dilation=1, groups=1):
        if stride == 2:
            dilation = 1
        self.c_in, self.c_out, self.stride = c_in, c_out, stride
        self.conv1 = USConv2d(c_in, c_out, 3, stride, dilation, groups)
        self.conv2 = USConv2d(c_out, c_out, 3, 1, dilation, groups)
        # the slimmable reference ALWAYS builds the skip conv; the plain one
        # only when shape changes — slimmable is our only mode
        self.skip = USConv2d(c_in, c_out, 1, stride, 1, 1)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"conv1": self.conv1.init(k1), "conv2": self.conv2.init(k2),
                "skip": self.skip.init(k3)}

    def apply(self, params, x, ratio=(1.0, 1.0), quantize=False):
        y = jax.nn.relu(self._norm(
            self.conv1.apply(params["conv1"], x, ratio, quantize)))
        y = self._norm(self.conv2.apply(params["conv2"], y,
                                        (ratio[1], ratio[1]), quantize))
        idn = self._norm(self.skip.apply(params["skip"], x, ratio, quantize))
        return jax.nn.relu(y + idn)

    def flops(self, size, ratio=(1.0, 1.0)):
        f1, s = self.conv1.flops(size, ratio)
        f2, s = self.conv2.flops(s, (ratio[1], ratio[1]))
        f3, _ = self.skip.flops(size, ratio)
        return f1 + f2 + f3, s


class DwsBlock(_OpBase):
    """Inverted-bottleneck depthwise block: 1x1 expand x4 -> 3x3 depthwise ->
    1x1 project + skip (reference 1601-1744)."""

    def __init__(self, c_in, c_out, k=3, stride=1, dilation=1, groups=1):
        if stride == 2:
            dilation = 1
        self.conv1 = USConv2d(c_in, c_in * 4, 1, 1, dilation, groups)
        self.conv2 = USConv2d(c_in * 4, c_in * 4, 3, stride, dilation,
                              groups=c_in * 4)
        self.conv3 = USConv2d(c_in * 4, c_out, 1, 1, dilation, groups)
        self.skip = USConv2d(c_in, c_out, 1, stride, 1, 1)

    def init(self, key):
        ks = jax.random.split(key, 4)
        return {n: getattr(self, n).init(k)
                for n, k in zip(("conv1", "conv2", "conv3", "skip"), ks)}

    def apply(self, params, x, ratio=(1.0, 1.0), quantize=False):
        y = jax.nn.relu(self._norm(
            self.conv1.apply(params["conv1"], x, (ratio[0], 1.0), quantize)))
        y = jax.nn.relu(self._norm(
            self.conv2.apply(params["conv2"], y, (1.0, 1.0), quantize)))
        y = self._norm(
            self.conv3.apply(params["conv3"], y, (1.0, ratio[1]), quantize))
        idn = self._norm(self.skip.apply(params["skip"], x, ratio, quantize))
        return jax.nn.relu(y + idn)

    def flops(self, size, ratio=(1.0, 1.0)):
        f1, s = self.conv1.flops(size, (ratio[0], 1.0))
        f2, s = self.conv2.flops(s, (1.0, 1.0))
        f3, s = self.conv3.flops(s, (1.0, ratio[1]))
        f4, _ = self.skip.flops(size, ratio)
        return f1 + f2 + f3 + f4, s


class SkipConnect(_OpBase):
    """1x1 conv -> [bn] -> relu 'skip' op (reference 1493-1599; its slimmable
    branch always convs, it is not an identity)."""

    def __init__(self, c_in, c_out, stride=1):
        self.conv = USConv2d(c_in, c_out, 1, stride, 1, 1)

    def init(self, key):
        return {"conv": self.conv.init(key)}

    def apply(self, params, x, ratio=(1.0, 1.0), quantize=False):
        return jax.nn.relu(self._norm(
            self.conv.apply(params["conv"], x, ratio, quantize)))

    def flops(self, size, ratio=(1.0, 1.0)):
        return self.conv.flops(size, ratio)


# OPS registry (reference operations.py:1745-1752)
OPS = {
    "skip": lambda c_in, c_out, stride: SkipConnect(c_in, c_out, stride),
    "conv3x3": lambda c_in, c_out, stride: Conv3x3(c_in, c_out, 3, stride, 1),
    "conv3x3_d2": lambda c_in, c_out, stride: Conv3x3(c_in, c_out, 3, stride, 2),
    "conv3x3_d4": lambda c_in, c_out, stride: Conv3x3(c_in, c_out, 3, stride, 4),
    "residual": lambda c_in, c_out, stride: BasicResidual(c_in, c_out, 3, stride),
    "dwsblock": lambda c_in, c_out, stride: DwsBlock(c_in, c_out, 3, stride),
}
PRIMITIVES = tuple(OPS)  # genotypes.PRIMITIVES is absent from the reference


@lru_cache(maxsize=None)
def _xla_flops_cached(op_key, c_in, c_out, stride, h, w):
    op = OPS[op_key](c_in, c_out, stride)
    params = op.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, c_in, h, w))
    compiled = jax.jit(lambda p, v: op.apply(p, v)).lower(params, x).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    return float(cost.get("flops", 0.0))


def xla_op_flops(op_key: str, size, stride: int = 1, c_out=None) -> float:
    """FLOPs of one full-width primitive from XLA's own cost analysis —
    the TPU-native replacement for the reference's thop lookup tables
    (operations.py:34-52). Cached per (op, shape)."""
    c_in, h, w = size
    return _xla_flops_cached(op_key, c_in, c_out or c_in, stride, h, w)
