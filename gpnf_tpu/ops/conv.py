"""Convolution primitives used by coupling networks.

Pure-function NCHW convolutions with the initialization schemes the flows
depend on (weight-std Conv2d + actnorm, zero-init Conv2dZeros with learnable
log-scale, weight-normalized convs). Reference semantics:
flow_modules/affine_coupling.py:10-66, flow_modules/mixlogcdf_nn.py:12-29,
models/modules/flow.py:26-83.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_DIMNUMS = ("NCHW", "OIHW", "NCHW")


def conv2d(x: jax.Array, w: jax.Array, b=None, *, stride=1, padding="SAME",
           dilation=1, layout: str = "NCHW") -> jax.Array:
    """2-D conv. Weight layout OIHW. preferred fp32 accumulation on MXU.

    layout="NHWC" runs channel-last — the TPU-native layout: XLA lowers
    NCHW convs by transposing operands, and those relayout copies dominate
    flow-model step time (docs/BENCHMARKS.md round-2 anatomy).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    # fp32 accumulation: explicit for fp32 inputs; bf16 convs accumulate fp32
    # on the MXU natively and an explicit preferred type breaks the conv
    # transpose rule under AD.
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    dimnums = _DIMNUMS if layout == "NCHW" else ("NHWC", "OIHW", "NHWC")

    # spatial parallelism (parallel/spatial.py): inside a `spatial_axis`
    # shard_map body, SAME stride-1 convs exchange halo rows along H over
    # the mesh axis and convolve VALID on H — bit-compatible with the
    # unsharded SAME conv (border shards receive zeros).
    from ..parallel import spatial as _sp
    sp_axis = _sp.current_spatial_axis()
    kh, kw = (w.shape[2], w.shape[3])
    if sp_axis is not None and kh > 1:
        assert padding == "SAME" and stride[0] == 1, (
            "spatial sharding supports stride-1 SAME convs on H", padding,
            stride)
        halo = (kh - 1) // 2 * dilation[0]
        x = _sp.halo_pad_h(x, sp_axis, halo, layout=layout)
        padding = ((0, 0), ((kw - 1) // 2 * dilation[1],) * 2)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        rhs_dilation=dilation, dimension_numbers=dimnums,
        preferred_element_type=preferred,
    )
    if b is not None:
        y = y + (b.reshape(1, -1, 1, 1) if layout == "NCHW" else b)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Plain conv with normal(0, weight_std) init and optional fused actnorm
# (Glow's `Conv2d`, affine_coupling.py:27-66 / flow.py:26-65).
# ---------------------------------------------------------------------------
class Conv2d:
    def __init__(self, in_ch: int, out_ch: int, kernel_size=3, *,
                 do_actnorm: bool = True, weight_std: float = 0.05):
        self.in_ch, self.out_ch = in_ch, out_ch
        self.k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        self.do_actnorm = do_actnorm
        self.weight_std = weight_std

    def init(self, key):
        w = jax.random.normal(key, (self.out_ch, self.in_ch, *self.k)) * self.weight_std
        p = {"w": w}
        if self.do_actnorm:
            p["an_bias"] = jnp.zeros((self.out_ch,))
            p["an_logs"] = jnp.zeros((self.out_ch,))
        else:
            p["b"] = jnp.zeros((self.out_ch,))
        return p

    def apply(self, params, x, layout: str = "NCHW"):
        cshape = (1, -1, 1, 1) if layout == "NCHW" else (1, 1, 1, -1)
        if self.do_actnorm:
            y = conv2d(x, params["w"], layout=layout)
            return (y + params["an_bias"].reshape(cshape)) * jnp.exp(
                params["an_logs"]).reshape(cshape)
        return conv2d(x, params["w"], params["b"], layout=layout)

    def ddi(self, params, x, eps: float = 1e-6):
        """Data-dependent init of the fused actnorm (mirrors Actnormlayer init)."""
        if not self.do_actnorm:
            return params, self.apply(params, x)
        y = conv2d(x, params["w"])
        mean = jnp.mean(y, axis=(0, 2, 3))
        var = jnp.mean((y - mean.reshape(1, -1, 1, 1)) ** 2, axis=(0, 2, 3))
        logs = jnp.log(1.0 / (jnp.sqrt(var) + eps))
        params = dict(params, an_bias=-mean, an_logs=logs)
        return params, self.apply(params, x)


# ---------------------------------------------------------------------------
# Zero-initialized conv with learnable per-channel log-scale
# (`Conv2dZeros`, affine_coupling.py:10-25 / flow.py:68-83).
# ---------------------------------------------------------------------------
class Conv2dZeros:
    def __init__(self, in_ch: int, out_ch: int, kernel_size=3, *,
                 logscale_factor: float = 3.0):
        self.in_ch, self.out_ch = in_ch, out_ch
        self.k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        self.logscale_factor = logscale_factor

    def init(self, key):
        del key
        return {
            "w": jnp.zeros((self.out_ch, self.in_ch, *self.k)),
            "b": jnp.zeros((self.out_ch,)),
            "logs": jnp.zeros((self.out_ch,)),
        }

    def apply(self, params, x, layout: str = "NCHW"):
        cshape = (1, -1, 1, 1) if layout == "NCHW" else (1, 1, 1, -1)
        y = conv2d(x, params["w"], params["b"], layout=layout)
        return y * jnp.exp(params["logs"] * self.logscale_factor).reshape(cshape)


# ---------------------------------------------------------------------------
# Weight-normalized conv (`WNConv2d`, mixlogcdf_nn.py:12-29). torch's
# weight_norm: w = g * v / ||v||, norm over all but the output-channel axis.
# ---------------------------------------------------------------------------
class WNConv2d:
    def __init__(self, in_ch: int, out_ch: int, kernel_size: int, *, bias: bool = True):
        self.in_ch, self.out_ch, self.k = in_ch, out_ch, kernel_size
        self.bias = bias

    def init(self, key):
        # torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +)
        fan_in = self.in_ch * self.k * self.k
        bound = 1.0 / jnp.sqrt(fan_in)
        kv, kb = jax.random.split(key)
        v = jax.random.uniform(kv, (self.out_ch, self.in_ch, self.k, self.k),
                               minval=-bound, maxval=bound)
        g = jnp.sqrt(jnp.sum(v.reshape(self.out_ch, -1) ** 2, axis=-1))
        p = {"v": v, "g": g}
        if self.bias:
            p["b"] = jax.random.uniform(kb, (self.out_ch,), minval=-bound, maxval=bound)
        return p

    def effective_weight(self, params, dtype=None):
        """The weight-normalized OIHW kernel; differentiable in v, g."""
        from jax.ad_checkpoint import checkpoint_name

        if "w_eff" in params:  # precompute_wn path: normalized outside scan
            w = params["w_eff"]
            return (w.astype(dtype) if dtype is not None and w.dtype != dtype
                    else w)
        v = params["v"].astype(jnp.float32)  # weight norm in fp32 under bf16
        norm = jnp.sqrt(jnp.sum(v.reshape(v.shape[0], -1) ** 2, axis=-1))
        g = params["g"].astype(jnp.float32)
        w = v * (g / norm).reshape(-1, 1, 1, 1)
        if dtype is not None:
            w = w.astype(dtype)
        # "wcast" is in the remat save policy: the normalized+cast weight is
        # tiny but otherwise recomputed per use in every rematted backward
        # (~1.5k sub-[192] kernels/step in the r3 anatomy, docs/BENCHMARKS.md)
        return checkpoint_name(w, "wcast")

    def apply(self, params, x, *, layout: str = "NCHW"):
        w = self.effective_weight(params, x.dtype)
        return conv2d(x, w, params.get("b"), layout=layout)


class WNDense:
    """Weight-normalized linear layer (torch nn.Linear + weight_norm).

    Used by the Flow++ gated attention (mixlogcdf_nn.py:124-125). Acts on the
    last axis.
    """

    def __init__(self, in_f: int, out_f: int, *, bias: bool = True):
        self.in_f, self.out_f, self.bias = in_f, out_f, bias

    def init(self, key):
        bound = 1.0 / jnp.sqrt(self.in_f)
        kv, kb = jax.random.split(key)
        v = jax.random.uniform(kv, (self.out_f, self.in_f), minval=-bound, maxval=bound)
        g = jnp.sqrt(jnp.sum(v**2, axis=-1))
        p = {"v": v, "g": g}
        if self.bias:
            p["b"] = jax.random.uniform(kb, (self.out_f,), minval=-bound, maxval=bound)
        return p

    def effective_weight(self, params, dtype=None):
        """The weight-normalized (out, in) matrix; differentiable in v, g."""
        from jax.ad_checkpoint import checkpoint_name

        if "w_eff" in params:  # precompute_wn path (stored fp32 for dense)
            w = params["w_eff"]
            return w.astype(dtype) if dtype is not None and w.dtype != dtype \
                else w
        v = params["v"].astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(v**2, axis=-1))
        g = params["g"].astype(jnp.float32)
        w = v * (g / norm)[:, None]
        w = w.astype(dtype) if dtype is not None else w
        return checkpoint_name(w, "wcast")  # saved, not recomputed, in remat

    def apply(self, params, x):
        w = self.effective_weight(params, x.dtype)
        y = jnp.einsum("...i,oi->...o", x, w, preferred_element_type=jnp.float32)
        y = y.astype(x.dtype)
        if self.bias:
            y = y + params["b"]
        return y


# ---------------------------------------------------------------------------
# precompute_wn: hoist weight normalization out of the K-step scan.
#
# Every WNConv2d/WNDense use recomputes norm + scale + cast per scan
# iteration (and again per rematted backward) — thousands of sub-[192]
# kernel launches per step (~20 ms/step of the r3 xprof anatomy,
# docs/BENCHMARKS.md). Applying this transform to the STACKED (K, ...)
# level params before `lax.scan` computes each layer's effective weight
# once for all K steps in one fused kernel; the scan then slices plain
# weights per iteration, and the "wcast" named saves become ordinary scan
# inputs (always live, never recomputed). Gradients flow v,g <- w_eff
# outside the scan, also K-fused.
# ---------------------------------------------------------------------------
def _wn_effective(v: jax.Array, g: jax.Array, dtype) -> jax.Array:
    """g * v / ||v||, norm over v's trailing (v.ndim - g.ndim) axes.

    Shape-generic: works on unstacked (out, ...) and K-stacked
    (K, out, ...) weight-norm params alike (g carries the leading axes)."""
    v32 = v.astype(jnp.float32)
    red = tuple(range(g.ndim, v.ndim))
    norm = jnp.sqrt(jnp.sum(v32 * v32, axis=red))
    scale = (g.astype(jnp.float32) / norm).reshape(
        g.shape + (1,) * (v.ndim - g.ndim))
    return (v32 * scale).astype(dtype)


def precompute_wn(tree, conv_dtype):
    """Replace every {v, g[, b]} weight-norm param dict in `tree` with
    {w_eff[, b]}. Conv weights (4-D-per-step v) are stored at `conv_dtype`
    (what WNConv2d.apply would cast to); dense weights stay fp32, matching
    WNDense.effective_weight(dtype=None) — its callers cast at use. The
    numerics are bit-identical to the per-use path (same fp32 norm, same
    cast order)."""
    def is_wn(x):
        return isinstance(x, dict) and "v" in x and "g" in x

    def conv(x):
        if not is_wn(x):
            return x
        is_dense = x["v"].ndim - x["g"].ndim == 1
        out = {"w_eff": _wn_effective(x["v"], x["g"],
                                      jnp.float32 if is_dense else conv_dtype)}
        if "b" in x:
            out["b"] = x["b"]
        return out

    return jax.tree.map(conv, tree, is_leaf=is_wn)
