"""EDVR-style video feature alignment and fusion (PCD align, TSA fusion).

Reference: /root/reference/operations.py — PCD_Align (393-516), Align_fea
(517-560), TSA_Fusion (744-831). These are the video-NAS search-space
capabilities the reference carries (dead at import time there: DCNv2Pack is
an unresolved CUDA extension); here they are live TPU-native modules built
on ops.deform.modulated_deform_conv2d.

Layout is NCHW throughout; pyramid lists are ordered [L1 (full res), L2
(half res)] matching the reference's 2-level PCD ("Reduce PCD cascade to 2
levels", operations.py:403).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .convrnn import _convnd
from .deform import DCNPack


def lrelu(x, slope: float = 0.1):
    return jnp.where(x >= 0, x, slope * x)


def _conv_init(key, out_ch, in_ch, k, bias=True):
    bound = 1.0 / math.sqrt(in_ch * k * k)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (out_ch, in_ch, k, k), minval=-bound,
                                 maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_ch,), minval=-bound, maxval=bound)
    return p


def _conv(params, x):
    return _convnd(x, params["w"], params.get("b"), ndim=2)


def upsample2x(x):
    """torch F.interpolate(scale_factor=2, mode='bilinear',
    align_corners=False) == jax.image.resize 'bilinear' (half-pixel)."""
    b, c, h, w = x.shape
    return jax.image.resize(x, (b, c, 2 * h, 2 * w), method="bilinear")


def _pool(x, kind: str):
    """torch {Max,Avg}Pool2d(3, stride=2, padding=1); avg counts zero pads
    (count_include_pad=True default)."""
    if kind == "max":
        init, op = -jnp.inf, jax.lax.max
    else:
        init, op = 0.0, jax.lax.add
    y = jax.lax.reduce_window(x, init, op, (1, 1, 3, 3), (1, 1, 2, 2),
                              [(0, 0), (0, 0), (1, 1), (1, 1)])
    return y / 9.0 if kind == "avg" else y


class PCDAlign:
    """2-level pyramid cascading deformable alignment (operations.py:393-499)."""

    def __init__(self, num_feat: int = 64, deformable_groups: int = 8):
        self.nf = num_feat
        self.dg = deformable_groups

    def init(self, key):
        ks = iter(jax.random.split(key, 16))
        nf = self.nf
        p = {}
        for lvl in ("l2", "l1"):
            p[f"offset_conv1_{lvl}"] = _conv_init(next(ks), nf, nf * 2, 3, bias=False)
            if lvl == "l2":
                p["offset_conv2_l2"] = _conv_init(next(ks), nf, nf, 3, bias=False)
            else:
                p["offset_conv2_l1"] = _conv_init(next(ks), nf, nf * 2, 3, bias=False)
                p["offset_conv3_l1"] = _conv_init(next(ks), nf, nf, 3, bias=False)
                p["feat_conv_l1"] = _conv_init(next(ks), nf, nf * 2, 3, bias=False)
            p[f"dcn_{lvl}"] = DCNPack(nf, nf, 3, self.dg).init(next(ks))
        p["cas_offset_conv1"] = _conv_init(next(ks), nf, nf * 2, 3, bias=False)
        p["cas_offset_conv2"] = _conv_init(next(ks), nf, nf, 3, bias=False)
        p["cas_dcn"] = DCNPack(nf, nf, 3, self.dg).init(next(ks))
        return p

    def apply(self, params, nbr_feat_l, ref_feat_l):
        """nbr_feat_l / ref_feat_l: [L1 (B,C,H,W), L2 (B,C,H/2,W/2)]."""
        dcn = DCNPack(self.nf, self.nf, 3, self.dg)
        up_offset = up_feat = None
        for i in (2, 1):
            lvl = f"l{i}"
            offset = jnp.concatenate([nbr_feat_l[i - 1], ref_feat_l[i - 1]], axis=1)
            offset = lrelu(_conv(params[f"offset_conv1_{lvl}"], offset))
            if i == 2:
                offset = lrelu(_conv(params["offset_conv2_l2"], offset))
            else:
                offset = lrelu(_conv(params["offset_conv2_l1"],
                                     jnp.concatenate([offset, up_offset], axis=1)))
                offset = lrelu(_conv(params["offset_conv3_l1"], offset))
            feat = dcn.apply(params[f"dcn_{lvl}"], nbr_feat_l[i - 1], offset)
            if i == 1:
                feat = _conv(params["feat_conv_l1"],
                             jnp.concatenate([feat, up_feat], axis=1))
            else:
                feat = lrelu(feat)
                up_offset = upsample2x(offset) * 2.0  # offsets scale with res
                up_feat = upsample2x(feat)
        offset = jnp.concatenate([feat, ref_feat_l[0]], axis=1)
        offset = lrelu(_conv(params["cas_offset_conv2"],
                             lrelu(_conv(params["cas_offset_conv1"], offset))))
        return lrelu(dcn.apply(params["cas_dcn"], feat, offset))


class AlignFea:
    """Single-level deformable alignment (operations.py:517-560):
    offsets from [nbr, ref] concat through offset_conv1, then a chain of
    SIX depthwise deformable-kernel convs (DKC (4,4), groups=nf —
    operations.py:521-526), one DCN on the neighbour features."""

    def __init__(self, nf: int = 64, groups: int = 8):
        self.nf, self.dg = nf, groups
        self.dkcs = [DeformKernelConv((4, 4), nf, nf, 3, groups=nf)
                     for _ in range(6)]

    def init(self, key):
        ks = iter(jax.random.split(key, 8))
        return {
            "offset_conv1": _conv_init(next(ks), self.nf, self.nf * 2, 3,
                                       bias=True),
            "dkcs": [d.init(next(ks)) for d in self.dkcs],
            "dcn": DCNPack(self.nf, self.nf, 3, self.dg).init(next(ks)),
        }

    def apply(self, params, nbr_fea, ref_fea):
        offset = jnp.concatenate([nbr_fea, ref_fea], axis=1)
        offset = lrelu(_conv(params["offset_conv1"], offset))
        for dkc, p in zip(self.dkcs, params["dkcs"]):
            offset = lrelu(dkc.apply(p, offset))
        return lrelu(DCNPack(self.nf, self.nf, 3, self.dg)
                     .apply(params["dcn"], nbr_fea, offset))


class SimpleNonLocalBlockVideo:
    """Gated 1x1x1-conv3d block (operations.py:561-616, both plain and NAS
    act_weights variants).

    Faithful to the reference's axis quirk: in 'channel' mode the conv3d is
    applied to (B, T, C, H, W) directly, so it MIXES FRAMES (in_ch must be
    num_frames); in 'temporal' mode the tensor is permuted to (B, C, T, H, W)
    so it mixes channels (in_ch = nf). act_weights, when given, blends
    relu/sigmoid/softmax gates as in the NAS variant (temporal mode only,
    matching operations.py:600-612).
    """

    def __init__(self, nf: int, mode: str):
        assert mode in ("channel", "temporal"), mode
        self.nf, self.mode = nf, mode

    def init(self, key):
        ks = jax.random.split(key, 3)
        return {name: _conv_init(k, self.nf, self.nf, 1)
                for name, k in zip(("convx1", "convx2", "convx4"), ks)}

    def _conv3d(self, p, x):
        return _convnd(x, p["w"][..., None], p["b"], ndim=3)  # (O,I,1,1,1)

    def apply(self, params, x1, act_weights=None):
        if self.mode == "channel":
            x = x1  # conv over the frame axis; (C, H, W) are conv3d spatials
            xa = jax.nn.sigmoid(self._conv3d(params["convx1"], x))
            xb = self._conv3d(params["convx2"], x) * xa
            x = self._conv3d(params["convx4"], xb)
        else:
            x = jnp.swapaxes(x1, 1, 2)  # BTCHW -> BCTHW
            intm = self._conv3d(params["convx1"], x)
            if act_weights is None:
                xa = jax.nn.sigmoid(intm)
            else:
                xa = (jax.nn.relu(intm) * act_weights[0]
                      + jax.nn.sigmoid(intm) * act_weights[1]
                      + jax.nn.softmax(intm, axis=1) * act_weights[2])
            xb = self._conv3d(params["convx2"], x) * xa
            xb = self._conv3d(params["convx4"], xb)
            x = jnp.swapaxes(xb, 1, 2)
        return x + x1


class EPAB:
    """Efficient parallel attention block (operations.py:671-699): channel +
    temporal gated blocks summed with the input (each branch already carries
    its own residual, so the input appears three times — reference quirk)."""

    def __init__(self, nf: int = 128, num_frames: int = 7):
        self.channel = SimpleNonLocalBlockVideo(num_frames, "channel")
        self.temporal = SimpleNonLocalBlockVideo(nf, "temporal")

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"channel": self.channel.init(k1),
                "temporal": self.temporal.init(k2)}

    def apply(self, params, f):
        return (self.channel.apply(params["channel"], f)
                + self.temporal.apply(params["temporal"], f) + f)


class EPABSpatioChannel:
    """NAS EPAB, channel branch only (operations.py:617-643): block output
    (with its residual) + input again."""

    def __init__(self, nf: int = 128, num_frames: int = 7):
        self.block = SimpleNonLocalBlockVideo(num_frames, "channel")

    def init(self, key):
        return {"block": self.block.init(key)}

    def apply(self, params, f, act_weights=None):
        return self.block.apply(params["block"], f, act_weights) + f


class EPABSpatioTemporal:
    """NAS EPAB, temporal branch only (operations.py:645-669)."""

    def __init__(self, nf: int = 128, num_frames: int = 7):
        self.block = SimpleNonLocalBlockVideo(nf, "temporal")

    def init(self, key):
        return {"block": self.block.init(key)}

    def apply(self, params, f, act_weights=None):
        return self.block.apply(params["block"], f, act_weights) + f


class DeformKernelConv:
    """Deformable-KERNEL conv (AIM2020 `DeformKernelConv2d`, unresolvable
    import at operations.py:19): the learned (2, k, k) offsets displace the
    k x k sampling grid INSIDE a scope x scope weight bank, and the
    effective kernel is the bank bilinearly resampled at those positions —
    deformation in weight space, not feature space. Grouped conv after
    resampling; offsets init to zero (regular grid over the bank)."""

    def __init__(self, scope, in_ch: int, out_ch: int, k: int = 3,
                 groups: int = 1):
        self.scope = scope if isinstance(scope, tuple) else (scope, scope)
        self.in_ch, self.out_ch, self.k, self.groups = in_ch, out_ch, k, groups

    def init(self, key):
        sh, sw = self.scope
        fan = (self.in_ch // self.groups) * sh * sw
        bound = 1.0 / math.sqrt(fan)
        kw, kb = jax.random.split(key)
        return {
            "bank": jax.random.uniform(
                kw, (self.out_ch, self.in_ch // self.groups, sh, sw),
                minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (self.out_ch,), minval=-bound,
                                    maxval=bound),
            "offsets": jnp.zeros((2, self.k, self.k)),
        }

    def effective_kernel(self, params):
        sh, sw = self.scope
        base_y = jnp.linspace(0.0, sh - 1.0, self.k)
        base_x = jnp.linspace(0.0, sw - 1.0, self.k)
        gy = base_y[:, None] + params["offsets"][0]
        gx = base_x[None, :] + params["offsets"][1]
        y0 = jnp.clip(jnp.floor(gy), 0, sh - 1)
        x0 = jnp.clip(jnp.floor(gx), 0, sw - 1)
        y1 = jnp.clip(y0 + 1, 0, sh - 1)
        x1 = jnp.clip(x0 + 1, 0, sw - 1)
        wy = jnp.clip(gy - y0, 0.0, 1.0)
        wx = jnp.clip(gx - x0, 0.0, 1.0)
        bank = params["bank"]  # (O, I/g, sh, sw)

        def at(yi, xi):  # gather (O, I/g, k, k) values at integer grid
            return bank[:, :, yi.astype(jnp.int32), xi.astype(jnp.int32)]

        return ((1 - wy) * (1 - wx) * at(y0, x0) + (1 - wy) * wx * at(y0, x1)
                + wy * (1 - wx) * at(y1, x0) + wy * wx * at(y1, x1))

    def apply(self, params, x):
        w = self.effective_kernel(params)
        return _convnd(x, w, params["b"], ndim=2, groups=self.groups)


class DKSpatialAttention:
    """DK_spatial_attention_v2 (operations.py:700-728) with its constructor
    bug fixed (the reference reads self.nf/self.num_frames before
    assignment, so the class cannot be built even with its deps): fusion
    conv over stacked frames, gated by a strided conv -> 5 depthwise
    deformable-kernel convs -> pixel-shuffle x2 -> sigmoid map."""

    def __init__(self, nf: int = 64, num_frames: int = 5):
        self.nf, self.n = nf, num_frames
        self.dkcs = [DeformKernelConv((4, 4), nf, nf, 3, groups=nf)
                     for _ in range(5)]

    def init(self, key):
        ks = iter(jax.random.split(key, 10))
        return {
            "fusion": _conv_init(next(ks), self.nf, self.nf * self.n, 3),
            "down": _conv_init(next(ks), self.nf, self.nf, 3),
            "dkcs": [d.init(next(ks)) for d in self.dkcs],
            "up": _conv_init(next(ks), 4 * self.nf, self.nf, 3),
            "out": _conv_init(next(ks), 1, self.nf, 1),
        }

    def apply(self, params, x):
        """x (B, T, C, H, W) -> (B, C, H, W), H/W even."""
        b, t, c, h, w = x.shape
        x = _conv(params["fusion"], x.reshape(b, t * c, h, w))
        a = jax.nn.relu(_convnd(x, params["down"]["w"], params["down"]["b"],
                                ndim=2, stride=2))
        for d, p in zip(self.dkcs, params["dkcs"]):
            a = jax.nn.relu(d.apply(p, a))
        a = _conv(params["up"], a)  # (B, 4nf, H/2, W/2)
        # PixelShuffle(2): (B, C*4, H, W) -> (B, C, 2H, 2W)
        bb, c4, hh, ww = a.shape
        a = a.reshape(bb, c4 // 4, 2, 2, hh, ww)
        a = a.transpose(0, 1, 4, 2, 5, 3).reshape(bb, c4 // 4, 2 * hh, 2 * ww)
        a = jax.nn.sigmoid(_conv(params["out"], a))
        return x * a


class TSAFusion:
    """Temporal (correlation) + spatial (pyramid) attention fusion
    (operations.py:744-817)."""

    def __init__(self, nf: int = 64, nframes: int = 5, center: int = 2):
        self.nf, self.n, self.center = nf, nframes, center

    def init(self, key):
        ks = iter(jax.random.split(key, 14))
        nf, n = self.nf, self.n
        return {
            "tAtt_1": _conv_init(next(ks), nf, nf, 3),
            "tAtt_2": _conv_init(next(ks), nf, nf, 3),
            "fea_fusion": _conv_init(next(ks), nf, n * nf, 1),
            "sAtt_1": _conv_init(next(ks), nf, n * nf, 1),
            "sAtt_2": _conv_init(next(ks), nf, nf * 2, 1),
            "sAtt_3": _conv_init(next(ks), nf, nf, 3),
            "sAtt_4": _conv_init(next(ks), nf, nf, 1),
            "sAtt_5": _conv_init(next(ks), nf, nf, 3),
            "sAtt_L1": _conv_init(next(ks), nf, nf, 1),
            "sAtt_L2": _conv_init(next(ks), nf, nf * 2, 3),
            "sAtt_L3": _conv_init(next(ks), nf, nf, 3),
            "sAtt_add_1": _conv_init(next(ks), nf, nf, 1),
            "sAtt_add_2": _conv_init(next(ks), nf, nf, 1),
        }

    def apply(self, params, aligned_fea):
        """aligned_fea (B, N, C, H, W) -> fused (B, C, H, W)."""
        b, n, c, h, w = aligned_fea.shape
        emb_ref = _conv(params["tAtt_2"], aligned_fea[:, self.center])
        emb = _conv(params["tAtt_1"], aligned_fea.reshape(-1, c, h, w))
        emb = emb.reshape(b, n, -1, h, w)
        # frame-to-center correlation -> sigmoid prob per (frame, pixel)
        cor = jnp.sum(emb * emb_ref[:, None], axis=2)  # (B, N, H, W)
        cor_prob = jax.nn.sigmoid(cor)[:, :, None]  # (B, N, 1, H, W)
        fea_w = (aligned_fea * cor_prob).reshape(b, n * c, h, w)

        fea = lrelu(_conv(params["fea_fusion"], fea_w))

        att = lrelu(_conv(params["sAtt_1"], fea_w))
        att = lrelu(_conv(params["sAtt_2"], jnp.concatenate(
            [_pool(att, "max"), _pool(att, "avg")], axis=1)))
        att_l = lrelu(_conv(params["sAtt_L1"], att))
        att_l = lrelu(_conv(params["sAtt_L2"], jnp.concatenate(
            [_pool(att_l, "max"), _pool(att_l, "avg")], axis=1)))
        att_l = lrelu(_conv(params["sAtt_L3"], att_l))
        att_l = upsample2x(att_l)

        att = lrelu(_conv(params["sAtt_3"], att))
        att = att + att_l
        att = lrelu(_conv(params["sAtt_4"], att))
        att = upsample2x(att)
        att = _conv(params["sAtt_5"], att)
        att_add = _conv(params["sAtt_add_2"],
                        lrelu(_conv(params["sAtt_add_1"], att)))
        att = jax.nn.sigmoid(att)
        return fea * att * 2.0 + att_add
