"""NAS search layer: gumbel-softmax supernet over searchable conv + attention
ops, with the AGD-style video-SR macro-architecture.

Reference: model_search.py — gumbel_softmax (31-60), MixedOp (133-231),
MixedOp_attn (232-292), Cell (293-331), Cell_attn (332-370), NAS_GAN
(396-824: forward 525-620, losses 681-779, arch params 781-824). Dead there
(unresolvable imports); live here on `ops/searchable.py` + the video ops.

TPU-first notes: the supernet forward is one jit-compiled program — the
gumbel draws are traced random ops, width choices are channel masks (static
shapes), and the expected-FLOPs penalty is computed OUTSIDE the traced graph
from XLA cost analysis of each primitive (`searchable.xla_op_flops`),
replacing the reference's thop/.npy lookup tables. The content/perceptual
term uses a fixed random conv feature stack: VGG weights cannot be fetched
in this zero-egress image (same substitute policy as utils/fid.py; absolute
loss values are not comparable to the reference's VGG numbers).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from . import register_model
from ..ops.searchable import OPS, PRIMITIVES, USConv2d, xla_op_flops
from ..ops.video_fusion import (AlignFea, EPABSpatioChannel,
                                EPABSpatioTemporal, PCDAlign, _conv,
                                _conv_init, lrelu)
from ..ops.convrnn import _convnd
from .video_sr import bicubic_resize, pixel_shuffle

# OPS_Attention (operations.py:1765-1768)
ATTN_OPS = {
    "epab_spatiochannel": EPABSpatioChannel,
    "epab_spatiotemporal": EPABSpatioTemporal,
}
PRIMITIVES_ATTN = tuple(ATTN_OPS)


# --------------------------------------------------------------------------
# Gumbel softmax (model_search.py:31-60)
# --------------------------------------------------------------------------
def gumbel_softmax(key, logits, temperature=1.0, hard=False):
    """Straight-through gumbel softmax over the last axis."""
    g = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-20)
                 + 1e-20)
    y = jax.nn.softmax((logits + g) / temperature, axis=-1)
    if not hard:
        return y
    y_hard = jax.nn.one_hot(jnp.argmax(y, -1), y.shape[-1], dtype=y.dtype)
    return y + jax.lax.stop_gradient(y_hard - y)


# --------------------------------------------------------------------------
# Mixed ops and cells
# --------------------------------------------------------------------------
class MixedOp:
    """Weighted sum over conv primitives; beta blends full/quantized paths;
    ratio is the (in, out) slimmable width pair (model_search.py:133-180)."""

    def __init__(self, c_in, c_out, stride=1, quantize="search"):
        self.quantize = quantize
        self.ops = [OPS[p](c_in, c_out, stride) for p in PRIMITIVES]

    def init(self, key):
        ks = jax.random.split(key, len(self.ops))
        return [op.init(k) for op, k in zip(self.ops, ks)]

    def apply(self, params, x, alpha, beta, ratio):
        r0, s0 = self._score(ratio[0])
        r1, s1 = self._score(ratio[1])
        out = 0.0
        for w, op, p in zip(alpha, self.ops, params):
            if self.quantize == "search":
                y = (beta[0] * op.apply(p, x, (r0, r1), quantize=False)
                     + beta[1] * op.apply(p, x, (r0, r1), quantize=True))
            else:
                y = op.apply(p, x, (r0, r1), quantize=bool(self.quantize))
            out = out + y * w * s0 * s1
        return out

    @staticmethod
    def _score(r):
        """ratio entry: float (forced width, score 1) or one-hot vector over
        WIDTH_MULTS (gumbel arch_ratio: argmax width, its prob as score)."""
        if isinstance(r, (int, float)):
            return float(r), 1.0
        widths = jnp.asarray(NASConfig.width_mults)
        return jnp.sum(r * widths), jnp.max(r)

    def flops(self, size, alpha, ratio, stride=1):
        """Expected FLOPs: XLA-counted full-width primitive cost scaled by
        the sliced-width ratio product, weighted by alpha (host-side)."""
        import numpy as np
        c_in, h, w = size
        r0 = self._host_ratio(ratio[0])
        r1 = self._host_ratio(ratio[1])
        total = 0.0
        for a, pkey in zip(np.asarray(alpha), PRIMITIVES):
            full = xla_op_flops(pkey, size, stride)
            total += float(a) * full * r0 * r1
        return total, (c_in, h // stride, w // stride)

    @staticmethod
    def _host_ratio(r):
        import numpy as np
        if isinstance(r, (int, float)):
            return float(r)
        widths = np.asarray(NASConfig.width_mults)
        return float(widths[int(np.argmax(np.asarray(r)))])


class Cell:
    """Chain of MixedOps with width ratios threaded between neighbours;
    residual 0.2 scaling (model_search.py:293-331)."""

    def __init__(self, nf, op_per_cell=5, quantize="search"):
        self.n = op_per_cell
        self.ops = [MixedOp(nf, nf, 1, quantize) for _ in range(op_per_cell)]

    def init(self, key):
        ks = jax.random.split(key, self.n)
        return [op.init(k) for op, k in zip(self.ops, ks)]

    def apply(self, params, x, alpha, beta, ratio):
        out = x
        for i, (op, p) in enumerate(zip(self.ops, params)):
            if self.n == 1:
                pair = (1.0, 1.0)
            elif i == 0:
                pair = (1.0, ratio[i])
            elif i == self.n - 1:
                pair = (ratio[i - 1], 1.0)
            else:
                pair = (ratio[i - 1], ratio[i])
            out = op.apply(p, out, alpha[i], beta[i], pair)
        return out * 0.2 + x

    def flops(self, size, alpha, ratio):
        total = 0.0
        for i, op in enumerate(self.ops):
            if self.n == 1:
                pair = (1.0, 1.0)
            elif i == 0:
                pair = (1.0, ratio[i])
            elif i == self.n - 1:
                pair = (ratio[i - 1], 1.0)
            else:
                pair = (ratio[i - 1], ratio[i])
            f, size = op.flops(size, alpha[i], pair)
            total += f
        return total, size


class MixedOpAttn:
    """Two-level attention-op DAG (model_search.py:232-292): level-1 mixtures
    feed each level-2 op; alpha_sink gates level-2 outputs and direct level-1
    sinks; alpha_acts blends relu/sigmoid/softmax inside each EPAB op."""

    def __init__(self, num_frames, nf):
        self.l1 = [ATTN_OPS[p](nf, num_frames) for p in PRIMITIVES_ATTN]
        self.l2 = [ATTN_OPS[p](nf, num_frames) for p in PRIMITIVES_ATTN]

    def init(self, key):
        ks = jax.random.split(key, len(self.l1) + len(self.l2))
        return {"l1": [op.init(k) for op, k in zip(self.l1, ks)],
                "l2": [op.init(k) for op, k in
                       zip(self.l2, ks[len(self.l1):])]}

    def apply(self, params, x, alpha_levels, alpha_sink, alpha_acts):
        n = len(PRIMITIVES_ATTN)
        acts_l1, acts_l2 = alpha_acts[:n], alpha_acts[n:]
        l1_outs = [op.apply(p, x, acts_l1[j])
                   for j, (op, p) in enumerate(zip(self.l1, params["l1"]))]
        out = 0.0
        for i, (op2, p2) in enumerate(zip(self.l2, params["l2"])):
            res = sum(l1_outs[j] * alpha_levels[i, j]
                      for j in range(len(l1_outs)))
            out = out + op2.apply(p2, res, acts_l2[i]) * alpha_sink[i]
        for k, o in enumerate(l1_outs):  # direct sinks
            out = out + alpha_sink[len(self.l2) + k] * o
        return out


class CellAttn:
    def __init__(self, num_frames, nf, op_per_cell=1):
        self.ops = [MixedOpAttn(num_frames, nf) for _ in range(op_per_cell)]

    def init(self, key):
        ks = jax.random.split(key, len(self.ops))
        return [op.init(k) for op, k in zip(self.ops, ks)]

    def apply(self, params, x, alpha_levels, alpha_sink, alpha_acts):
        out = x
        for i, (op, p) in enumerate(zip(self.ops, params)):
            out = op.apply(p, out, alpha_levels[i], alpha_sink[i],
                           alpha_acts[i])
        return out * 0.2 + x


# --------------------------------------------------------------------------
# Supernet
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class NASConfig:
    nf: int = 64
    num_frames: int = 9
    center: int = 4
    num_cell: int = 5
    op_per_cell: int = 5
    num_cell_attn: int = 1
    op_per_cell_attn: int = 1
    align: str = "dkc"  # 'dkc' | 'pcd' (model_search.py:437-442)
    quantize: str = "search"  # 'search' | True | False
    # loss_weight = [base, style, content, tv] (model_search.py:398)
    loss_weight: Tuple[float, ...] = (1e0, 1e5, 1e0, 1e-7)
    loss_func: str = "mse"  # 'mse' | 'l1'
    flops_weight: float = 0.0  # FLOPs-aware penalty coefficient
    tanh_out: bool = False  # ENABLE_TANH (operations.py:15)
    width_mults = (0.5, 0.75, 1.0)  # class attr: shared width list


@register_model("nas_video_sr")
class NASVideoSR:
    """AGD-style searchable video-SR supernet (NAS_GAN equivalent): x16 SR
    of the center frame through 4 pixel-shuffle x2 stages."""

    def __init__(self, cfg: NASConfig = NASConfig()):
        self.cfg = cfg
        nf = cfg.nf
        self.conv_first = USConv2d(3, nf, 3, bias=True)
        self.align = (AlignFea(nf, 8) if cfg.align == "dkc"
                      else PCDAlign(nf, 8))
        self.cells_pre = [Cell(nf, cfg.op_per_cell, cfg.quantize)
                          for _ in range(cfg.num_cell)]
        self.cells_attn = [CellAttn(cfg.num_frames, nf, cfg.op_per_cell_attn)
                           for _ in range(cfg.num_cell_attn)]
        self.cells_recon = [Cell(nf, cfg.op_per_cell, cfg.quantize)
                            for _ in range(cfg.num_cell)]

    # ------------------------------------------------------------- params
    def init(self, key):
        cfg, nf = self.cfg, self.cfg.nf
        n_keys = 2 * cfg.num_cell + cfg.num_cell_attn + 11 \
            + (2 if cfg.align == "pcd" else 0)
        ks = iter(jax.random.split(key, n_keys))
        p = {
            "conv_first": self.conv_first.init(next(ks)),
            "cells_pre": [c.init(next(ks)) for c in self.cells_pre],
            "align": self.align.init(next(ks)),
            "cells_attn": [c.init(next(ks)) for c in self.cells_attn],
            "conv_attn_final": _conv_init(next(ks), nf, nf * cfg.num_frames,
                                          3),
            "cells_recon": [c.init(next(ks)) for c in self.cells_recon],
            # x16 upsample chain (model_search.py:459-468)
            "conv11": _conv_init(next(ks), nf // 2, nf, 3),
            "conv112": _conv_init(next(ks), 3 * 4, nf // 2, 3),
            "conv12": _conv_init(next(ks), 3, 3, 3),
            "conv122": _conv_init(next(ks), 3 * 4, 3, 3),
            "conv13": _conv_init(next(ks), 3, 3, 3),
            "conv132": _conv_init(next(ks), 3 * 4, 3, 3),
            "conv14": _conv_init(next(ks), 3, 3, 3),
            "conv142": _conv_init(next(ks), 3 * 4, 3, 3),
        }
        if cfg.align == "pcd":
            p["fea_l2_conv1"] = _conv_init(next(ks), nf, nf, 3)
            p["fea_l2_conv2"] = _conv_init(next(ks), nf, nf, 3)
        return p

    def init_arch(self, key=None):
        """Arch parameters, 1e-3-uniform init (model_search.py:781-824)."""
        del key
        cfg = self.cfg
        n_ops, n_attn = len(PRIMITIVES), len(PRIMITIVES_ATTN)
        n_w = len(NASConfig.width_mults)
        return {
            "alpha": 1e-3 * jnp.ones((cfg.num_cell, cfg.op_per_cell, n_ops)),
            "beta": 1e-3 * jnp.ones((cfg.num_cell, cfg.op_per_cell, 2)),
            "ratio": 1e-3 * jnp.ones((cfg.num_cell, cfg.op_per_cell - 1,
                                      n_w)),
            "alpha_att_levels": 1e-3 * jnp.ones(
                (cfg.num_cell_attn, cfg.op_per_cell_attn, n_attn, n_attn)),
            "alpha_sink": 1e-3 * jnp.ones(
                (cfg.num_cell_attn, cfg.op_per_cell_attn, 2 * n_attn)),
            "alpha_activations": 1e-3 * jnp.ones(
                (cfg.num_cell_attn, cfg.op_per_cell_attn, 2 * n_attn, 3)),
        }

    # ------------------------------------------------------------ sampling
    def sample_ratio(self, arch, key, mode="arch_ratio"):
        """Width sample per (cell, inter-op boundary): gumbel one-hots in
        'arch_ratio' mode, forced floats otherwise (model_search.py:479-523)."""
        cfg = self.cfg
        widths = NASConfig.width_mults
        if mode == "arch_ratio":
            logits = jax.nn.log_softmax(arch["ratio"], axis=-1)
            keys = jax.random.split(key, cfg.num_cell * (cfg.op_per_cell - 1))
            out = []
            for ci in range(cfg.num_cell):
                row = []
                for oi in range(cfg.op_per_cell - 1):
                    k = keys[ci * (cfg.op_per_cell - 1) + oi]
                    row.append(gumbel_softmax(k, logits[ci, oi], hard=True))
                out.append(row)
            return out
        if mode in ("min", "max"):
            w = widths[0] if mode == "min" else widths[-1]
            return [[w] * (cfg.op_per_cell - 1)] * cfg.num_cell
        if mode == "random":
            idx = jax.random.randint(
                key, (cfg.num_cell, cfg.op_per_cell - 1), 0, len(widths))
            return [[float(widths[int(idx[c, o])])
                     for o in range(cfg.op_per_cell - 1)]
                    for c in range(cfg.num_cell)]
        raise ValueError(mode)

    # ------------------------------------------------------------- forward
    def apply(self, params, arch, x, rng=None, prun_mode="arch_ratio"):
        """x (B, N, 3, H, W) -> (B, 3, 16H, 16W)."""
        cfg = self.cfg
        b, n, c, h, w = x.shape
        assert n == cfg.num_frames
        rng = jax.random.PRNGKey(0) if rng is None else rng
        alpha = jax.nn.softmax(arch["alpha"], -1)
        beta = jax.nn.softmax(arch["beta"], -1)
        a_lvl = jax.nn.softmax(arch["alpha_att_levels"], -1)
        a_sink = jax.nn.softmax(arch["alpha_sink"], -1)
        a_act = jax.nn.softmax(arch["alpha_activations"], -1)
        # Fresh width draws per stage: the reference resamples prun_ratio
        # between the attention and recon stages (model_search.py:585-589),
        # so pre/recon widths are decorrelated.
        k_r, k_r2 = jax.random.split(rng)
        ratio = self.sample_ratio(arch, k_r, prun_mode)
        ratio_recon = self.sample_ratio(arch, k_r2, prun_mode)

        out = orig = self.conv_first.apply(params["conv_first"],
                                           x.reshape(b * n, c, h, w))
        for i, cell in enumerate(self.cells_pre):
            out = cell.apply(params["cells_pre"][i], out, alpha[i], beta[i],
                             ratio[i])
        out = out + orig

        l1 = out.reshape(b, n, -1, h, w)
        if cfg.align == "pcd":
            l2 = lrelu(_conv(params["fea_l2_conv2"], lrelu(
                _convnd(out, params["fea_l2_conv1"]["w"],
                        params["fea_l2_conv1"]["b"], ndim=2, stride=2))))
            l2 = l2.reshape(b, n, -1, h // 2, w // 2)
            ref = [l1[:, cfg.center], l2[:, cfg.center]]
            aligned = jax.vmap(
                lambda f1, f2: self.align.apply(params["align"], [f1, f2],
                                                ref),
                in_axes=1, out_axes=1)(l1, l2)
        else:
            ref = l1[:, cfg.center]
            aligned = jax.vmap(
                lambda f: self.align.apply(params["align"], f, ref),
                in_axes=1, out_axes=1)(l1)

        out = orig = aligned  # (B, N, nf, H, W)
        for i, cell in enumerate(self.cells_attn):
            out = cell.apply(params["cells_attn"][i], out, a_lvl[i],
                             a_sink[i], a_act[i])
        out = out + orig

        out = orig = _conv(params["conv_attn_final"],
                           out.reshape(b, -1, h, w))
        for i, cell in enumerate(self.cells_recon):
            out = cell.apply(params["cells_recon"][i], out, alpha[i],
                             beta[i], ratio_recon[i])
        out = out + orig

        center = x[:, cfg.center]
        y = lrelu(_conv(params["conv11"], out))
        y = lrelu(_conv(params["conv112"], y))
        y = pixel_shuffle(y, 2) + bicubic_resize(center, 2)
        y = lrelu(_conv(params["conv12"], y))
        y = lrelu(_conv(params["conv122"], y))
        y = pixel_shuffle(y, 2) + bicubic_resize(center, 4)
        y = lrelu(_conv(params["conv13"], y))
        y = lrelu(_conv(params["conv132"], y))
        y = pixel_shuffle(y, 2) + bicubic_resize(center, 8)
        y = lrelu(_conv(params["conv14"], y))
        y = _conv(params["conv142"], y)
        y = pixel_shuffle(y, 2) + bicubic_resize(center, 16)
        if cfg.tanh_out:
            y = (jnp.tanh(y) + 1.0) / 2.0
        return y

    # -------------------------------------------------------------- losses
    def _base(self, a, b):
        d = a - b
        return jnp.mean(d * d) if self.cfg.loss_func == "mse" \
            else jnp.mean(jnp.abs(d))

    @staticmethod
    def gram(x):
        """Style Gram matrix (model_search.py:681-686)."""
        b, c, h, w = x.shape
        f = x.reshape(b, c, h * w)
        return jnp.einsum("bcn,bdn->bcd", f, f) / (c * h * w)

    def criterion_image(self, y_hat, x, feature_fn=None):
        """base + content(perceptual) + tv (model_search.py:688-703)."""
        bw, _, cw, tvw = self.cfg.loss_weight
        loss = bw * self._base(y_hat, x)
        if feature_fn is not None:
            loss = loss + cw * self._base(feature_fn(x), feature_fn(y_hat))
        tv = (jnp.sum(jnp.abs(y_hat[..., 1:] - y_hat[..., :-1]))
              + jnp.sum(jnp.abs(y_hat[..., 1:, :] - y_hat[..., :-1, :])))
        return loss + tvw * tv

    def style_loss(self, y_hat, x):
        sw = self.cfg.loss_weight[1]
        return sw * jnp.mean((self.gram(y_hat) - self.gram(x)) ** 2)

    def derive(self, geno: dict) -> "DerivedVideoSR":
        """Discretize: build the single-op network the genotype selects
        (AGD retrain-stage network; `operations_infer.py` surface). Use
        `derive_params(supernet_params, geno)` to keep the searched
        weights."""
        return DerivedVideoSR(self.cfg, geno)

    def flops_table(self, size_hw):
        """Static per-primitive full-width FLOPs at (nf, h, w), from XLA cost
        analysis (host-side; compute once, outside jit). All cell ops are
        stride-1 nf->nf so one table covers every (cell, op) slot."""
        import numpy as np
        h, w = size_hw
        size = (self.cfg.nf, h, w)
        return np.asarray([xla_op_flops(p, size, 1) for p in PRIMITIVES])

    def arch_flops_expected(self, arch, flops_table):
        """Differentiable E[FLOPs] of the conv cells under softmax(alpha) and
        E[width] = softmax(ratio)@widths — the arch-step penalty term
        (TPU-native replacement for the reference's thop/.npy table path,
        model_search.py:719-779). `flops_table` is the (n_ops,) array from
        `self.flops_table` (precomputed host-side; jnp-traceable here)."""
        cfg = self.cfg
        table = jnp.asarray(flops_table)
        alpha = jax.nn.softmax(arch["alpha"], -1)  # (cells, ops, n_ops)
        if cfg.op_per_cell > 1:
            widths = jnp.asarray(NASConfig.width_mults)
            er = jax.nn.softmax(arch["ratio"], -1) @ widths
            ones = jnp.ones((cfg.num_cell, 1))
            r_in = jnp.concatenate([ones, er], axis=1)
            r_out = jnp.concatenate([er, ones], axis=1)
        else:
            r_in = r_out = jnp.ones((cfg.num_cell, cfg.op_per_cell))
        per_op = (alpha @ table) * r_in * r_out
        return 2.0 * jnp.sum(per_op)  # pre + recon stages share alpha

    def arch_flops(self, arch, size_hw) -> float:
        """Host-side expected supernet FLOPs for the penalty term: conv cells
        weighted by softmax(alpha) and the argmax width, primitive costs from
        XLA cost analysis."""
        import numpy as np
        h, w = size_hw
        alpha = np.asarray(jax.nn.softmax(arch["alpha"], -1))
        ratio_logits = np.asarray(arch["ratio"])
        widths = np.asarray(NASConfig.width_mults)
        total = 0.0
        size = (self.cfg.nf, h, w)
        for cells in (self.cells_pre, self.cells_recon):
            for ci, cell in enumerate(cells):
                r = [float(widths[int(np.argmax(ratio_logits[ci, oi]))])
                     for oi in range(self.cfg.op_per_cell - 1)]
                f, _ = cell.flops(size, alpha[ci], r)
                total += f
        return total


class DerivedVideoSR:
    """Discretized supernet (the reference's `operations_infer.py` surface:
    the post-search network with one chosen primitive per slot at a fixed
    width/quantize choice, same macro-architecture). Construct with
    `NASVideoSR.derive(genotype)`; weights can be transplanted from the
    supernet with `derive_params` (AGD retains supernet weights for the
    retrain stage)."""

    def __init__(self, cfg: NASConfig, geno: dict):
        self.cfg, self.geno = cfg, geno
        nf = cfg.nf
        self.conv_first = USConv2d(3, nf, 3, bias=True)
        self.align = (AlignFea(nf, 8) if cfg.align == "dkc"
                      else PCDAlign(nf, 8))
        # one concrete op per (cell, slot), shared across pre/recon (the
        # supernet shares alpha between the two stages)
        self.cell_ops = [[OPS[name](nf, nf, 1) for name in row]
                         for row in geno["cells"]]
        self.attn_l1 = [[ATTN_OPS[p](nf, cfg.num_frames)
                         for p in PRIMITIVES_ATTN]
                        for _ in range(cfg.num_cell_attn)]
        self.attn_l2 = [[ATTN_OPS[p](nf, cfg.num_frames)
                         for p in PRIMITIVES_ATTN]
                        for _ in range(cfg.num_cell_attn)]

    def init(self, key):
        """Fresh init (retrain-from-scratch); same param tree shape as the
        transplanted one apart from cells_* holding single-op params."""
        cfg, nf = self.cfg, self.cfg.nf
        n_attn = len(PRIMITIVES_ATTN)
        n_keys = 2 * cfg.num_cell \
            + 2 * cfg.num_cell_attn * cfg.op_per_cell_attn + 11 \
            + (2 if cfg.align == "pcd" else 0)
        ks = iter(jax.random.split(key, n_keys))
        p = {
            "conv_first": self.conv_first.init(next(ks)),
            "cells_pre": [[op.init(k) for op, k in
                           zip(row, jax.random.split(next(ks), len(row)))]
                          for row in self.cell_ops],
            "align": self.align.init(next(ks)),
            "cells_attn": [
                [{"l1": [op.init(k) for op, k in
                         zip(self.attn_l1[i],
                             jax.random.split(next(ks), n_attn))],
                  "l2": [op.init(k) for op, k in
                         zip(self.attn_l2[i],
                             jax.random.split(next(ks), n_attn))]}
                 for _ in range(cfg.op_per_cell_attn)]
                for i in range(cfg.num_cell_attn)],
            "conv_attn_final": _conv_init(next(ks), nf, nf * cfg.num_frames,
                                          3),
            "cells_recon": [[op.init(k) for op, k in
                             zip(row, jax.random.split(next(ks), len(row)))]
                            for row in self.cell_ops],
            "conv11": _conv_init(next(ks), nf // 2, nf, 3),
            "conv112": _conv_init(next(ks), 3 * 4, nf // 2, 3),
            "conv12": _conv_init(next(ks), 3, 3, 3),
            "conv122": _conv_init(next(ks), 3 * 4, 3, 3),
            "conv13": _conv_init(next(ks), 3, 3, 3),
            "conv132": _conv_init(next(ks), 3 * 4, 3, 3),
            "conv14": _conv_init(next(ks), 3, 3, 3),
            "conv142": _conv_init(next(ks), 3 * 4, 3, 3),
        }
        if cfg.align == "pcd":
            p["fea_l2_conv1"] = _conv_init(next(ks), nf, nf, 3)
            p["fea_l2_conv2"] = _conv_init(next(ks), nf, nf, 3)
        return p

    def _cell_pairs(self, ci):
        n = self.cfg.op_per_cell
        ws = self.geno["widths"][ci] if n > 1 else []
        pairs = []
        for i in range(n):
            if n == 1:
                pairs.append((1.0, 1.0))
            elif i == 0:
                pairs.append((1.0, ws[0]))
            elif i == n - 1:
                pairs.append((ws[i - 1], 1.0))
            else:
                pairs.append((ws[i - 1], ws[i]))
        return pairs

    def _quantize(self, ci, oi):
        """beta is only trained in 'search' mode (MixedOp.apply ignores it
        otherwise) — for fixed-quantize configs keep the config's choice,
        not the argmax of an untrained beta."""
        if self.cfg.quantize == "search":
            return bool(self.geno["quantized"][ci][oi])
        return bool(self.cfg.quantize)

    def _run_cells(self, cell_params, x):
        out = x
        for ci, row in enumerate(self.cell_ops):
            pairs = self._cell_pairs(ci)
            h = out
            for oi, op in enumerate(row):
                h = op.apply(cell_params[ci][oi], h, pairs[oi],
                             quantize=self._quantize(ci, oi))
            out = h * 0.2 + out
        return out

    def _run_attn(self, params, x):
        n = len(PRIMITIVES_ATTN)
        out = x
        for i in range(self.cfg.num_cell_attn):
            h = out
            for oi in range(self.cfg.op_per_cell_attn):
                levels = self.geno["attn_levels"][i][oi]
                sink = int(self.geno["attn_sink"][i][oi])
                acts = self.geno["attn_acts"][i][oi]
                hot = lambda a: jax.nn.one_hot(a, 3)
                pa = params[i][oi]
                if sink < n:  # level-2 op fed by its chosen level-1 op
                    j = int(levels[sink])
                    mid = self.attn_l1[i][j].apply(
                        pa["l1"][j], h, hot(acts[j]))
                    y = self.attn_l2[i][sink].apply(
                        pa["l2"][sink], mid, hot(acts[n + sink]))
                else:  # direct level-1 sink
                    k = sink - n
                    y = self.attn_l1[i][k].apply(
                        pa["l1"][k], h, hot(acts[k]))
                h = y
            out = h * 0.2 + out
        return out

    def apply(self, params, x):
        cfg = self.cfg
        b, nfr, c, h, w = x.shape
        assert nfr == cfg.num_frames
        orig = self.conv_first.apply(params["conv_first"],
                                     x.reshape(b * nfr, c, h, w))
        out = self._run_cells(params["cells_pre"], orig)
        out = out + orig

        l1 = out.reshape(b, nfr, -1, h, w)
        if cfg.align == "pcd":
            l2 = lrelu(_conv(params["fea_l2_conv2"], lrelu(
                _convnd(out, params["fea_l2_conv1"]["w"],
                        params["fea_l2_conv1"]["b"], ndim=2, stride=2))))
            l2 = l2.reshape(b, nfr, -1, h // 2, w // 2)
            ref = [l1[:, cfg.center], l2[:, cfg.center]]
            aligned = jax.vmap(
                lambda f1, f2: self.align.apply(params["align"], [f1, f2],
                                                ref),
                in_axes=1, out_axes=1)(l1, l2)
        else:
            ref = l1[:, cfg.center]
            aligned = jax.vmap(
                lambda f: self.align.apply(params["align"], f, ref),
                in_axes=1, out_axes=1)(l1)

        out = orig = aligned
        out = self._run_attn(params["cells_attn"], out)
        out = out + orig

        orig = _conv(params["conv_attn_final"], out.reshape(b, -1, h, w))
        out = self._run_cells(params["cells_recon"], orig)
        out = out + orig

        center = x[:, cfg.center]
        y = lrelu(_conv(params["conv11"], out))
        y = lrelu(_conv(params["conv112"], y))
        y = pixel_shuffle(y, 2) + bicubic_resize(center, 2)
        y = lrelu(_conv(params["conv12"], y))
        y = lrelu(_conv(params["conv122"], y))
        y = pixel_shuffle(y, 2) + bicubic_resize(center, 4)
        y = lrelu(_conv(params["conv13"], y))
        y = lrelu(_conv(params["conv132"], y))
        y = pixel_shuffle(y, 2) + bicubic_resize(center, 8)
        y = lrelu(_conv(params["conv14"], y))
        y = _conv(params["conv142"], y)
        y = pixel_shuffle(y, 2) + bicubic_resize(center, 16)
        if cfg.tanh_out:
            y = (jnp.tanh(y) + 1.0) / 2.0
        return y


def derive_params(supernet_params, geno):
    """Transplant supernet weights into the DerivedVideoSR param tree:
    each mixed slot keeps only the chosen primitive's params (AGD retains
    supernet weights for retraining). Attention cell params pass through
    whole (the derived net indexes the same l1/l2 lists)."""
    idx = {name: i for i, name in enumerate(PRIMITIVES)}
    out = dict(supernet_params)
    for stage in ("cells_pre", "cells_recon"):
        out[stage] = [
            [slot_params[idx[name]]
             for slot_params, name in zip(cell_params, row)]
            for cell_params, row in zip(supernet_params[stage],
                                        geno["cells"])]
    return out


def genotype(arch):
    """Discretize arch params -> chosen primitives/widths (host-side)."""
    import numpy as np
    widths = np.asarray(NASConfig.width_mults)
    sel = {
        "cells": [[PRIMITIVES[int(i)] for i in row]
                  for row in np.argmax(np.asarray(arch["alpha"]), -1)],
        "quantized": np.argmax(np.asarray(arch["beta"]), -1).tolist(),
        "widths": [[float(widths[int(i)]) for i in row]
                   for row in np.argmax(np.asarray(arch["ratio"]), -1)],
        "attn_levels": np.argmax(
            np.asarray(arch["alpha_att_levels"]), -1).tolist(),
        "attn_sink": np.argmax(np.asarray(arch["alpha_sink"]), -1).tolist(),
        "attn_acts": np.argmax(
            np.asarray(arch["alpha_activations"]), -1).tolist(),
    }
    return sel


class PerceptualFeatures:
    """Fixed random conv feature stack — in-env VGGFeature substitute for the
    content loss (no pretrained weights in a zero-egress image; same policy
    as utils/fid.py's RandomFeatureEmbedder)."""

    def __init__(self, seed: int = 0, widths=(32, 64)):
        key = jax.random.PRNGKey(seed)
        self.ws = []
        c_in = 3
        for c_out in widths:
            key, k = jax.random.split(key)
            std = (2.0 / (c_in * 9)) ** 0.5
            self.ws.append(std * jax.random.normal(k, (c_out, c_in, 3, 3)))
            c_in = c_out

    def __call__(self, x):
        for w in self.ws:
            x = jax.nn.leaky_relu(
                _convnd(x, jax.lax.stop_gradient(w), None, ndim=2, stride=2),
                0.2)
        return x
