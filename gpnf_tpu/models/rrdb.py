"""RRDB (ESRGAN) low-resolution encoder producing a conditioning pyramid.

Reference: models/modules/RRDBNet_arch.py — ResidualDenseBlock_5C (25-45),
RRDB (48-61), RRDBNet (64-148). Returns the feature dict the conditional
flow consumes: last_lr_fea / fea_up1 / fea_up2 / fea_up4 (+8/16/32 for larger
scales), optional fea_up0 and fea_up-1 downsamples (136-141), per-block
features block_{i} (92-99), with optional stackRRDB concatenation handled in
`srflow.py` (SRFlowNet_arch.py:118-138).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d


def _kaiming_normal(key, shape, scale=1.0):
    fan_in = shape[1] * shape[2] * shape[3]
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape) * std * scale


def _conv_init(key, out_ch, in_ch, k=3, scale=0.1):
    kw, kb = jax.random.split(key)
    return {"w": _kaiming_normal(kw, (out_ch, in_ch, k, k), scale),
            "b": jnp.zeros((out_ch,))}


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def nearest_resize(x, h_out: int, w_out: int, layout: str = "NCHW"):
    """Nearest resize with torch F.interpolate semantics: src index =
    floor(dst * in / out) (asymmetric origin, NOT half-pixel rounding —
    jax.image.resize differs on downsampling). Pure gather, up or down."""
    ah, aw = (2, 3) if layout == "NCHW" else (1, 2)
    h_in, w_in = x.shape[ah], x.shape[aw]
    rows = jnp.asarray((jnp.arange(h_out) * h_in) // h_out)
    cols = jnp.asarray((jnp.arange(w_out) * w_in) // w_out)
    if layout == "NCHW":
        return x[:, :, rows[:, None], cols[None, :]]
    return x[:, rows[:, None], cols[None, :], :]


def _resize(x, factor, method, layout: str = "NCHW"):
    if layout == "NCHW":
        b, c, h, w = x.shape
    else:
        b, h, w, c = x.shape
    h2, w2 = int(round(h * factor)), int(round(w * factor))
    if method == "nearest":
        return nearest_resize(x, h2, w2, layout)
    # antialias=False matches torch F.interpolate(mode='bilinear',
    # align_corners=False) downsampling (RRDBNet_arch.py:136-141); jax's
    # default antialiased kernel does not.
    shape = (b, c, h2, w2) if layout == "NCHW" else (b, h2, w2, c)
    return jax.image.resize(x, shape, method=method, antialias=False)


@dataclass(frozen=True)
class RRDBConfig:
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    scale: int = 4
    stack_blocks: Tuple[int, ...] = ()  # network_G.flow.stackRRDB.blocks
    fea_up0: bool = False
    fea_up_n1: bool = False  # fea_up-1
    # "bfloat16": the whole encoder runs on the MXU in bf16 (pure
    # conditioning features, no logdet math); outputs are cast back to fp32
    # at the feature-dict boundary.
    compute_dtype: str = "float32"


class ResidualDenseBlock5C:
    """5-conv dense block; out = x + 0.2 * conv5(cat(...))."""

    def __init__(self, nf: int, gc: int):
        self.nf, self.gc = nf, gc

    def init(self, key):
        ks = jax.random.split(key, 5)
        nf, gc = self.nf, self.gc
        return {f"conv{i+1}": _conv_init(ks[i], gc if i < 4 else nf, nf + i * gc)
                for i in range(5)}

    def apply(self, p, x, layout: str = "NCHW"):
        ax = 1 if layout == "NCHW" else 3
        x1 = _lrelu(conv2d(x, p["conv1"]["w"], p["conv1"]["b"], layout=layout))
        x2 = _lrelu(conv2d(jnp.concatenate([x, x1], ax), p["conv2"]["w"], p["conv2"]["b"], layout=layout))
        x3 = _lrelu(conv2d(jnp.concatenate([x, x1, x2], ax), p["conv3"]["w"], p["conv3"]["b"], layout=layout))
        x4 = _lrelu(conv2d(jnp.concatenate([x, x1, x2, x3], ax), p["conv4"]["w"], p["conv4"]["b"], layout=layout))
        x5 = conv2d(jnp.concatenate([x, x1, x2, x3, x4], ax), p["conv5"]["w"], p["conv5"]["b"], layout=layout)
        return x5 * 0.2 + x


class RRDBlock:
    def __init__(self, nf: int, gc: int):
        self.rdbs = [ResidualDenseBlock5C(nf, gc) for _ in range(3)]

    def init(self, key):
        ks = jax.random.split(key, 3)
        return {"rdb1": self.rdbs[0].init(ks[0]), "rdb2": self.rdbs[1].init(ks[1]),
                "rdb3": self.rdbs[2].init(ks[2])}

    def apply(self, p, x, layout: str = "NCHW"):
        out = self.rdbs[0].apply(p["rdb1"], x, layout)
        out = self.rdbs[1].apply(p["rdb2"], out, layout)
        out = self.rdbs[2].apply(p["rdb3"], out, layout)
        return out * 0.2 + x


class RRDBNet:
    def __init__(self, cfg: RRDBConfig):
        self.cfg = cfg
        self.blocks = [RRDBlock(cfg.nf, cfg.gc) for _ in range(cfg.nb)]
        self.n_up = {4: 2, 8: 3, 16: 4, 32: 5}[cfg.scale]

    def init(self, key):
        cfg = self.cfg
        ks = jax.random.split(key, cfg.nb + 6 + self.n_up)
        it = iter(ks)
        p = {
            "conv_first": _conv_init(next(it), cfg.nf, cfg.in_nc, scale=1.0),
            "blocks": [b.init(next(it)) for b in self.blocks],
            "trunk_conv": _conv_init(next(it), cfg.nf, cfg.nf, scale=1.0),
            "upconvs": [_conv_init(next(it), cfg.nf, cfg.nf, scale=1.0)
                        for _ in range(self.n_up)],
            "hr_conv": _conv_init(next(it), cfg.nf, cfg.nf, scale=1.0),
            "conv_last": _conv_init(next(it), cfg.out_nc, cfg.nf, scale=1.0),
        }
        return p

    def apply(self, params, x, get_steps: bool = False):
        cfg = self.cfg
        bf16 = cfg.compute_dtype == "bfloat16"
        lo = "NHWC" if bf16 else "NCHW"
        if bf16:
            # bf16 AND channel-last together: one transpose pair around the
            # whole encoder; bf16 NCHW convs measured SLOWER than fp32 on
            # TPU (docs/BENCHMARKS.md r4 SRFlow A/B)
            from jax.ad_checkpoint import checkpoint_name
            x = x.astype(jnp.bfloat16).transpose(0, 2, 3, 1)
            params = jax.tree.map(
                lambda a: checkpoint_name(a.astype(jnp.bfloat16), "wcast"),
                params)
        fea = conv2d(x, params["conv_first"]["w"], params["conv_first"]["b"],
                     layout=lo)
        block_results = {}
        for idx, (blk, bp) in enumerate(zip(self.blocks, params["blocks"])):
            fea = blk.apply(bp, fea, lo)
            if idx in cfg.stack_blocks:
                block_results[f"block_{idx}"] = fea
        trunk = conv2d(fea, params["trunk_conv"]["w"],
                       params["trunk_conv"]["b"], layout=lo)
        last_lr_fea = fea + trunk

        results: Dict[str, jax.Array] = {
            "last_lr_fea": last_lr_fea,
            "fea_up1": last_lr_fea,
        }
        fea = last_lr_fea
        for i, up in enumerate(params["upconvs"]):
            fea_up = conv2d(_resize(fea, 2, "nearest", lo), up["w"], up["b"],
                            layout=lo)
            fea = _lrelu(fea_up)
            # the reference's inplace LeakyReLU (RRDBNet_arch.py:88,106-119)
            # mutates the stored fea_upN AFTER it enters the results dict, so
            # the flow conditions on the POST-lrelu tensor; replicated here.
            results[f"fea_up{2 ** (i + 1)}"] = fea
        out = conv2d(_lrelu(conv2d(fea, params["hr_conv"]["w"],
                                   params["hr_conv"]["b"], layout=lo)),
                     params["conv_last"]["w"], params["conv_last"]["b"],
                     layout=lo)
        results["out"] = out

        if cfg.fea_up0:
            results["fea_up0"] = _resize(last_lr_fea, 0.5, "bilinear", lo)
        if cfg.fea_up_n1:
            results["fea_up-1"] = _resize(last_lr_fea, 0.25, "bilinear", lo)

        if bf16:
            # fp32 NCHW at the conditioning boundary (once per train step —
            # the flow's affine heads and logdet math stay full-precision)
            back = lambda v: v.astype(jnp.float32).transpose(0, 3, 1, 2)
            results = {k: back(v) for k, v in results.items()}
            block_results = {k: back(v) for k, v in block_results.items()}
        if get_steps:
            results.update(block_results)
            return results
        # results["out"] went through the bf16 fp32/NCHW restore above;
        # the raw local `out` is NHWC bf16 on that path
        return results["out"]
