"""MixLogCDF (Flow++) coupling and its gated conv/attention network.

Reference: flow_modules/mixlogcdf_coupling.py (coupling math) and
flow_modules/mixlogcdf_nn.py (NN 32-78, ConvAttnBlock 81-102, GatedAttn
105-224, GatedConv 227-260, Rescale 263-276).

Forward:  u = logit(MixLogCDF(x_change)); y = (u + b) * exp(a)
Inverse:  u = y*exp(-a) - b; x = MixLogCDF^{-1}(sigmoid(u).clip(1e-5, 1-1e-5))
with per-element log-dets accumulated exactly as the reference does
(mixlogcdf_coupling.py:42-53).
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from . import logistic
from .basic import split_channels, sum_except_batch
from .conv import WNConv2d, WNDense


def concat_elu(x, axis=1):
    return jax.nn.elu(jnp.concatenate([x, -x], axis=axis))


def _dropout(rng, x, rate, train, *, channelwise=False, layout="NCHW"):
    if not train or rate == 0.0 or rng is None:
        return x
    if channelwise:  # torch Dropout2d: zero whole (C,) feature maps
        shape = ((x.shape[0], x.shape[1], 1, 1) if layout == "NCHW"
                 else (x.shape[0], 1, 1, x.shape[3]))
    else:
        shape = x.shape
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


class LayerNorm:
    """torch nn.LayerNorm(C) applied to channel-last tensors."""

    def __init__(self, dim: int, eps: float = 1e-5):
        self.dim, self.eps = dim, eps

    def init(self, key):
        del key
        return {"gamma": jnp.ones((self.dim,)), "beta": jnp.zeros((self.dim,))}

    def apply(self, params, x):
        xf = x.astype(jnp.float32)  # stats in fp32 even under bf16 compute
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        xn = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return xn * params["gamma"] + params["beta"]


class GatedConv:
    """PixelCNN++ gated residual conv: concat-ELU -> 3x3 -> concat-ELU -> 1x1 GLU.

    Runs in either layout; the coupling network uses NHWC end-to-end on TPU
    (channel axis = -1) so no conv relayouts are needed.
    """

    def __init__(self, num_ch: int, drop_prob: float = 0.0, aux_ch=None):
        self.nc = num_ch
        self.drop_prob = drop_prob
        self.conv = WNConv2d(2 * num_ch, num_ch, 3)
        self.gate = WNConv2d(2 * num_ch, 2 * num_ch, 1)
        self.aux_conv = WNConv2d(2 * aux_ch, num_ch, 1) if aux_ch else None

    def init(self, key):
        ks = jax.random.split(key, 3)
        p = {"conv": self.conv.init(ks[0]), "gate": self.gate.init(ks[1])}
        if self.aux_conv:
            p["aux"] = self.aux_conv.init(ks[2])
        return p

    def apply(self, params, x, aux=None, *, rng=None, train=False,
              layout="NCHW"):
        ch_axis = 1 if layout == "NCHW" else -1
        h = self.conv.apply(params["conv"], concat_elu(x, ch_axis),
                            layout=layout)
        if aux is not None and self.aux_conv is not None:
            h = h + self.aux_conv.apply(params["aux"], concat_elu(aux, ch_axis),
                                        layout=layout)
        h = concat_elu(h, ch_axis)
        h = _dropout(rng, h, self.drop_prob, train, channelwise=True,
                     layout=layout)
        # "gate_in" tag: adding it to remat_save_names spends B*H*W*2C bf16
        # per block to skip the 3x3-conv chain recompute in the rematted
        # backward (the tag alone is free — only names in the save policy
        # are materialized)
        from jax.ad_checkpoint import checkpoint_name
        h = checkpoint_name(h, "gate_in")
        h = self.gate.apply(params["gate"], h, layout=layout)
        a, b = jnp.split(h, 2, axis=ch_axis)
        return a * jax.nn.sigmoid(b)

    def apply_fused(self, params, x, *, rng=None, train=False):
        """One-kernel path (+residual): the whole concat-ELU -> 3x3 conv ->
        concat-ELU -> Dropout2d -> 1x1 GLU -> +x chain runs in a single
        Pallas launch (ops/pallas/fused_gated_conv.py) — nothing between x
        and the output touches HBM, and the custom VJP recomputes the chain
        in VMEM so remat saves only (x, effective weights). NHWC, no aux."""
        from .pallas.fused_gated_conv import fused_gated_conv

        w1 = self.conv.effective_weight(params["conv"], x.dtype)  # (C,2C,3,3)
        w1 = jnp.transpose(w1, (2, 3, 1, 0))  # taps (3, 3, 2C, C)
        wg = self.gate.effective_weight(params["gate"], x.dtype)  # (2C,2C,1,1)
        wg = wg[:, :, 0, 0].T  # input-major (2C, 2C)
        rate = self.drop_prob if (train and rng is not None) else 0.0
        seed = (jax.random.randint(rng, (1,), 0, 2**30, jnp.int32)
                if rng is not None else jnp.zeros((1,), jnp.int32))
        return fused_gated_conv(seed, x, w1, params["conv"]["b"], wg,
                                params["gate"]["b"], rate, train)


def sinusoidal_pos_enc(seq_len: int, num_channels: int, dtype=jnp.float32):
    """Transformer sinusoidal positions (mixlogcdf_nn.py:209-224)."""
    position = jnp.arange(seq_len, dtype=jnp.float32)
    num_timescales = num_channels // 2
    log_inc = math.log(10000.0) / max(num_timescales - 1, 1)
    inv_timescales = jnp.exp(jnp.arange(num_timescales, dtype=jnp.float32) * -log_inc)
    scaled = position[:, None] * inv_timescales[None, :]
    enc = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)
    if num_channels % 2:
        enc = jnp.pad(enc, ((0, 0), (0, 1)))
    return enc.astype(dtype)[None]


class GatedAttn:
    """Gated multi-head self-attention over the flattened spatial axis."""

    def __init__(self, d_model: int, num_heads: int = 4, drop_prob: float = 0.0):
        self.d_model, self.num_heads, self.drop_prob = d_model, num_heads, drop_prob
        self.in_proj = WNDense(d_model, 3 * d_model, bias=False)
        self.gate = WNDense(d_model, 2 * d_model)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"in_proj": self.in_proj.init(k1), "gate": self.gate.init(k2)}

    def apply(self, params, x, *, rng=None, train=False):
        # x: (B, H, W, C) channel-last
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        seq = seq + sinusoidal_pos_enc(h * w, c, seq.dtype)

        # fused kernel on TPU: qkv projection + head split + scores + softmax
        # + dropout + PV all inside one differentiation boundary — the
        # (B, n, S, S) weights/mask and the (B, n, S, C/n) head copies never
        # touch HBM, and the (B, S, 3C) projection is recomputed in backward
        # rather than saved (the largest no-remat activation class,
        # scripts/profile_train.py); jnp path elsewhere.
        from .pallas.fused_attention import (MAX_S, fused_attention_long,
                                             fused_attention_proj)

        w_in = self.in_proj.effective_weight(params["in_proj"])  # (3C, C)
        rate = self.drop_prob if (train and rng is not None) else 0.0
        seed = (jax.random.randint(rng, (1,), 0, 2**30, jnp.int32)
                if rng is not None else jnp.zeros((1,), jnp.int32))
        # S <= 512: batch-blocked kernel with the projection in-kernel.
        # S > 512 (64px level 0 is S=1024): per-(batch, head) long-S
        # kernel — the old jnp fallback materialized (B, H, S, S) scores
        # in HBM and was the dominant 64px cost (docs/BENCHMARKS.md
        # "ImageNet-64", r5).
        fused = (fused_attention_proj if seq.shape[1] <= MAX_S
                 else fused_attention_long)
        attn = fused(seed, seq, w_in, self.num_heads, rate,
                     train).astype(x.dtype)
        # "attn_out" is ON the default remat save policy: spending B*S*C
        # bf16 of HBM per block to skip the attention-forward recompute in
        # backward measured +7.6% on TPU v5e (748 -> 805 img/s,
        # docs/BENCHMARKS.md); drop it from remat_save_names to trade back
        from jax.ad_checkpoint import checkpoint_name
        if os.environ.get("GPNF_ATTN_SAVE_IMG", "0") == "1":
            # A/B: tag AFTER the image-space reshape so the saved tensor's
            # layout matches its NHWC gate-conv consumer (the (B,S,C)-tagged
            # saves show as ~52 ms/step of layout-changing `checkpoint`
            # copies in xprof, scripts/profile_train.py r3 anatomy)
            attn = checkpoint_name(attn.reshape(b, h, w, c), "attn_out")
        else:
            attn = checkpoint_name(attn, "attn_out")
            attn = attn.reshape(b, h, w, c)

        gated = self.gate.apply(params["gate"], attn)
        # "attn_gate" tag: saving it skips the gate-projection recompute in
        # the rematted backward (opt-in via remat_save_names, like gate_in)
        gated = checkpoint_name(gated, "attn_gate")
        a, g = jnp.split(gated, 2, axis=-1)
        return a * jax.nn.sigmoid(g)


class ConvAttnBlock:
    def __init__(self, num_ch: int, drop_prob: float, use_attn: bool, aux_ch=None,
                 sub_remat: bool = False, fused_gconv: bool = False):
        self.conv = GatedConv(num_ch, drop_prob, aux_ch)
        self.norm1 = LayerNorm(num_ch)
        self.use_attn = use_attn
        # one-launch GatedConv+residual Pallas kernel (NHWC, no aux)
        self.fused_gconv = fused_gconv and aux_ch is None
        # "noattn" remat mode: checkpoint ONLY the conv branch and the norms
        # (their recompute is cheap elementwise/conv work) and leave the
        # attention + gate matmuls un-rematted, so their outputs cross the
        # K-step scan as ORDINARY stacked residuals instead of named-save
        # barrier copies — the `checkpoint bf16[256,256,96]` save copies
        # measured 52 ms/step (~12 GB/s effective) at the 995 plateau.
        self.sub_remat = sub_remat
        if use_attn:
            self.attn = GatedAttn(num_ch, drop_prob=drop_prob)
            self.norm2 = LayerNorm(num_ch)

    def init(self, key):
        ks = jax.random.split(key, 4)
        p = {"conv": self.conv.init(ks[0]), "norm1": self.norm1.init(ks[1])}
        if self.use_attn:
            p["attn"] = self.attn.init(ks[2])
            p["norm2"] = self.norm2.init(ks[3])
        return p

    def apply(self, params, x, aux=None, *, rng=None, train=False,
              mark_ckpt=True, layout="NCHW"):
        """layout="NHWC": x is channel-last throughout — convs run in the
        TPU-native layout and the per-block NCHW<->NHWC transposes (2 HBM
        relayouts per block) disappear."""
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)

        fused = self.fused_gconv and aux is None and layout == "NHWC"

        def conv_res(p, xx, aa, rr):
            return self.conv.apply(p, xx, aa, rng=rr, train=train,
                                   layout=layout) + xx

        if self.sub_remat:
            # saves only (params, x, aux, rng); the concat-ELU/3x3/GLU chain
            # recomputes in backward — cheaper than storing its fp32
            # elementwise intermediates (the no-remat OOM class). The fused
            # kernel's custom VJP already has exactly these residuals, so it
            # is NOT additionally wrapped.
            conv_res = jax.checkpoint(conv_res)
            norm = lambda p, xx, n=None: jax.checkpoint(
                (self.norm1 if n == 1 else self.norm2).apply)(p, xx)
        else:
            norm = lambda p, xx, n=None: (
                self.norm1 if n == 1 else self.norm2).apply(p, xx)
        if fused:
            x = self.conv.apply_fused(params["conv"], x, rng=r1, train=train)
        else:
            x = conv_res(params["conv"], x, aux, r1)
        if layout == "NCHW":
            x = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC for norms/attention
        x = norm(params["norm1"], x, 1)
        if self.use_attn:
            x = self.attn.apply(params["attn"], x, rng=r2, train=train) + x
            x = norm(params["norm2"], x, 2)
        if layout == "NCHW":
            x = x.transpose(0, 3, 1, 2)
        if not mark_ckpt:
            return x
        # block-granular remat boundary: under the scan-body checkpoint with
        # save_only_these_names, block outputs are kept (cheap: C channels)
        # so the backward pass recomputes at most one block, not the stack
        from jax.ad_checkpoint import checkpoint_name
        return checkpoint_name(x, "remat_ckpt")


class MixLogCDFNet:
    """Produces (a, b, pi, mu, scales) with K mixture components per element.

    compute_dtype: run the conv/attention stack in bf16 on the MXU while the
    mixture log-density math stays fp32 (outputs are upcast).
    """

    def __init__(self, in_ch: int, num_ch: int, num_blocks: int, num_components: int,
                 drop_prob: float, use_attn: bool = True, aux_ch=None,
                 compute_dtype=None, block_remat: bool = False,
                 sub_remat: bool = False, fused_gconv: bool = False):
        self.k = num_components
        self.in_ch = in_ch
        self.in_conv = WNConv2d(in_ch, num_ch, 3)
        self.blocks = [ConvAttnBlock(num_ch, drop_prob, use_attn, aux_ch,
                                     sub_remat=sub_remat,
                                     fused_gconv=fused_gconv)
                       for _ in range(num_blocks)]
        self.out_conv = WNConv2d(num_ch, in_ch * (2 + 3 * self.k), 3)
        self.compute_dtype = compute_dtype
        # per-block jax.checkpoint: block internals recompute in backward,
        # block boundaries are saved as ordinary values (no named-save
        # barriers — the scan-body save_only_these_names policy materializes
        # "checkpoint" copy ops measured at ~92 ms/step on TPU)
        self.block_remat = block_remat
        # "noattn" mode (see ConvAttnBlock): sub-checkpoint conv/norm/head
        # regions, leave attention outputs as plain residuals
        self.sub_remat = sub_remat

    def init(self, key):
        ks = jax.random.split(key, len(self.blocks) + 3)
        return {
            "in_conv": self.in_conv.init(ks[0]),
            "blocks": [blk.init(k) for blk, k in zip(self.blocks, ks[1:-2])],
            "out_conv": self.out_conv.init(ks[-2]),
            "rescale": jnp.ones((self.in_ch, 1, 1)),
        }

    def _cast_params(self, tree):
        if self.compute_dtype is None:
            return tree
        from jax.ad_checkpoint import checkpoint_name
        # tagged "wcast": saved by the remat policy so the backward pass
        # doesn't redo ~40 tiny casts per coupling net
        cast = lambda t: (checkpoint_name(t.astype(self.compute_dtype),
                                          "wcast")
                          if jnp.issubdtype(t.dtype, jnp.floating) else t)
        return jax.tree.map(cast, tree)

    def apply_blocks(self, params, x, aux=None, *, rng=None, train=False):
        """in_conv + ConvAttn blocks, channel-last; returns (B,H,W,Cmid)."""
        rngs = jax.random.split(rng, len(self.blocks)) if rng is not None else [None] * len(self.blocks)
        net_params = self._cast_params({k: params[k] for k in
                                        ("in_conv", "blocks")})
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            if aux is not None:
                aux = aux.astype(self.compute_dtype)
        # the whole stack runs channel-last (TPU-native): ONE relayout here
        # and one at the exit instead of NCHW conv relayouts + 2 transposes
        # per block (docs/BENCHMARKS.md round-2 step anatomy)
        x = x.transpose(0, 2, 3, 1)
        if aux is not None:
            aux = aux.transpose(0, 2, 3, 1)
        y = self.in_conv.apply(net_params["in_conv"], x, layout="NHWC")
        for blk, p, r in zip(self.blocks, net_params["blocks"], rngs):
            if self.block_remat:
                def block_fn(pp, yy, aa, rr, blk=blk):
                    return blk.apply(pp, yy, aa, rng=rr, train=train,
                                     mark_ckpt=False, layout="NHWC")
                y = jax.checkpoint(block_fn)(p, y, aux, r)
            else:
                y = blk.apply(p, y, aux, rng=r, train=train, layout="NHWC")
        return y

    def apply_head(self, params, y, shape):
        """out_conv + fp32 mixture-parameter head. y: (B,H,W,Cmid)."""
        b, c, h, w = shape
        out_p = self._cast_params(params["out_conv"])
        y = self.out_conv.apply(out_p, y, layout="NHWC")
        y = y.transpose(0, 3, 1, 2)
        y = y.astype(jnp.float32)  # log-density math stays fp32

        y = y.reshape(b, 2 + 3 * self.k, c, h, w)
        a, t = y[:, 0], y[:, 1]
        pi = y[:, 2 : 2 + self.k]
        mu = y[:, 2 + self.k : 2 + 2 * self.k]
        scales = jnp.clip(y[:, 2 + 2 * self.k :], min=-7.0)  # Flow++ clamp
        a = params["rescale"][None] * jnp.tanh(a)
        return a, t, pi, mu, scales

    def apply(self, params, x, aux=None, *, rng=None, train=False):
        b, c, h, w = x.shape
        y = self.apply_blocks(params, x, aux, rng=rng, train=train)
        return self.apply_head(params, y, (b, c, h, w))


class MixLogCDFCoupling:
    def __init__(self, in_ch: int, mid_ch: int, num_blocks: int = 10,
                 num_components: int = 32, drop_prob: float = 0.2,
                 use_attn: bool = True, aux_ch=None, compute_dtype=None,
                 block_remat: bool = False, sub_remat: bool = False,
                 fused_gconv: bool = False):
        self.net = MixLogCDFNet(in_ch // 2, mid_ch, num_blocks, num_components,
                                drop_prob, use_attn, aux_ch,
                                compute_dtype=compute_dtype,
                                block_remat=block_remat, sub_remat=sub_remat,
                                fused_gconv=fused_gconv)
        self.sub_remat = sub_remat

    def init(self, key):
        return {"net": self.net.init(key)}

    def _head(self, net_params, y_blocks, x_change):
        """out_conv + fp32 mixture math + fused transform/ldj kernel. In
        "noattn" mode this whole region is one jax.checkpoint: its fp32
        intermediates (per-component pi/mu/logs, the no-remat OOM class at
        4x192 MB per level-0 step) recompute in backward instead of being
        stored; only y_blocks and x_change are saved."""
        from .pallas.fused_mixlogcdf import mixlogcdf_forward

        bsz, ch = x_change.shape[0], x_change.shape[1]
        a, b, pi, mu, s = self.net.apply_head(
            net_params, y_blocks, (bsz, ch, *x_change.shape[2:]))
        k = pi.shape[1]
        flat = lambda t: t.reshape(bsz, -1)
        y, ldj = mixlogcdf_forward(flat(x_change), flat(a), flat(b),
                                   pi.reshape(bsz, k, -1),
                                   mu.reshape(bsz, k, -1),
                                   s.reshape(bsz, k, -1))
        return y, jnp.sum(ldj, axis=-1)

    def forward(self, params, x, logdet, *, rng=None, train=False, **_):
        x_change, x_id = split_channels(x)
        # fused Pallas kernel on TPU: mixture CDF/PDF + logit + affine + ldj
        # in one VMEM pass (jnp reference elsewhere)
        y_blocks = self.net.apply_blocks(params["net"], x_id, rng=rng,
                                         train=train)
        head = jax.checkpoint(self._head) if self.sub_remat else self._head
        y, ldj_sum = head(params["net"], y_blocks, x_change)
        out = y.reshape(x_change.shape)
        logdet = logdet + ldj_sum
        return jnp.concatenate([out, x_id], axis=1), logdet

    def inverse(self, params, y, logdet, *, rng=None, train=False, **_):
        from .pallas.fused_mixture_inverse import mixture_inverse

        x_change, x_id = split_channels(y)
        a, b, pi, mu, s = self.net.apply(params["net"], x_id, rng=rng, train=train)
        out = x_change * jnp.exp(-a) - b
        out, scale_ldj = logistic.logit_transform(out, reverse=True)
        out = jnp.clip(out, 1e-5, 1.0 - 1e-5)
        # flattened (B, K, D) layout: lane-friendly reductions; fused
        # bisection+Newton kernel on TPU (one launch instead of ~29 passes)
        bsz, k = out.shape[0], pi.shape[1]
        out = mixture_inverse(out.reshape(bsz, -1), pi.reshape(bsz, k, -1),
                              mu.reshape(bsz, k, -1),
                              s.reshape(bsz, k, -1)).reshape(x_change.shape)
        logistic_ldj = logistic.mixture_log_pdf(out, pi, mu, s)
        logdet = logdet - sum_except_batch(a + scale_ldj + logistic_ldj)
        return jnp.concatenate([out, x_id], axis=1), logdet
