"""SRFlow: conditional normalizing flow for photo super-resolution.

Reference: models/modules/SRFlowNet_arch.py (30-158), FlowUpsamplerNet.py
(29-309), FlowStep.py (31-145), FlowAffineCouplingsAblation.py (25-135),
Split.py (26-86), Permutations.py (25-58). TPU-first: pure-function bijector
stack; the non-LU inv-1x1's reverse uses an on-device fp32 inverse instead of
the reference's float64 round trip (Permutations.py:41-42); the dead
`self.f` head (FlowUpsamplerNet.py:107-110) is not reproduced.

Step order (this fork's variant with invertible attention,
FlowStep.py:88-115): actnorm -> invconv -> [cond-affine] -> attn1 ->
attn2(permute). Level l (1-indexed) conditions on the RRDB pyramid entry
`levelToName[l]` (FlowUpsamplerNet.py:49-74).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.actnorm import ActNorm
from ..ops.attention import InvertibleAttention
from ..ops.basic import GaussianDiag, Squeeze, split_channels, sum_except_batch
from ..ops.conv import Conv2d, Conv2dZeros, conv2d
from . import register_model
from .rrdb import RRDBConfig, RRDBNet, nearest_resize


# --------------------------------------------------------------------------
# Non-LU invertible 1x1 (Permutations.py:25-58)
# --------------------------------------------------------------------------
class NonLUInvConv:
    def __init__(self, num_channels: int):
        self.nc = num_channels

    def init(self, key):
        import numpy as np
        rng = np.random.default_rng(np.asarray(jax.random.key_data(key)).ravel())
        w = np.linalg.qr(rng.standard_normal((self.nc, self.nc)))[0].astype(np.float32)
        return {"w": jnp.asarray(w)}

    def _ldj(self, params, x):
        h, w = x.shape[2], x.shape[3]
        return jnp.linalg.slogdet(params["w"])[1] * (h * w)

    def forward(self, params, x, logdet, **_):
        y = conv2d(x, params["w"][:, :, None, None])
        return y, logdet + self._ldj(params, x)

    def inverse(self, params, y, logdet, **_):
        w_inv = jnp.linalg.inv(params["w"])
        x = conv2d(y, w_inv[:, :, None, None])
        return x, logdet - self._ldj(params, y)


# --------------------------------------------------------------------------
# Conditional affine coupling (FlowAffineCouplingsAblation.py:25-135)
# --------------------------------------------------------------------------
class _FNet:
    """Conv2d(3x3,+actnorm) -> relu -> [Conv2d(1x1,+actnorm) -> relu] -> Conv2dZeros.

    compute_dtype=bfloat16 runs the hidden convs on the MXU in bf16 (weights
    and activations cast at entry, fp32 accumulation native to the MXU); the
    zero-init out head producing scale/shift stays fp32 — same precision
    discipline as the flagship coupling nets (ops/mixlogcdf.py)."""

    def __init__(self, in_ch, out_ch, hidden_ch, kernel_hidden=1, n_hidden=1,
                 compute_dtype=None):
        self.layers = [Conv2d(in_ch, hidden_ch, 3)]
        for _ in range(n_hidden):
            self.layers.append(Conv2d(hidden_ch, hidden_ch, kernel_hidden))
        self.out = Conv2dZeros(hidden_ch, out_ch, 3)
        self.compute_dtype = compute_dtype

    def init(self, key):
        ks = jax.random.split(key, len(self.layers) + 1)
        return {"hidden": [l.init(k) for l, k in zip(self.layers, ks[:-1])],
                "out": self.out.init(ks[-1])}

    def apply(self, params, x):
        dt = self.compute_dtype
        if dt is not None:
            # bf16 AND channel-last together: bf16 NCHW convs measured
            # SLOWER than fp32 on TPU (443 -> 367 device img/s, r4 A/B) —
            # XLA's conv relayouts dominate; one transpose pair around the
            # whole net beats per-conv operand transposes (the mAR-SCF r2
            # NHWC lesson, docs/BENCHMARKS.md).
            from jax.ad_checkpoint import checkpoint_name
            x = x.astype(dt).transpose(0, 2, 3, 1)
            hidden = [
                {k: checkpoint_name(v.astype(dt), "wcast") for k, v in p.items()}
                for p in params["hidden"]]
            for l, p in zip(self.layers, hidden):
                x = jax.nn.relu(l.apply(p, x, layout="NHWC"))
            y = self.out.apply(params["out"], x.astype(jnp.float32),
                               layout="NHWC")
            return y.transpose(0, 3, 1, 2)
        for l, p in zip(self.layers, params["hidden"]):
            x = jax.nn.relu(l.apply(p, x))
        return self.out.apply(params["out"], x)

    def ddi(self, params, x):
        hidden = []
        for l, p in zip(self.layers, params["hidden"]):
            p, x = l.ddi(p, x)
            x = jax.nn.relu(x)
            hidden.append(p)
        return dict(params, hidden=hidden), self.out.apply(params["out"], x)


class CondAffineSeparatedAndCond:
    """Two-stage conditional affine: image-feature affine on all channels,
    then self-conditional affine of z2 on (z1, ft). Keeps the reference's
    non-standard z1 injection: scale = sigmoid(raw + 2 + z1) + eps,
    shift = raw_shift + z1 (FlowAffineCouplingsAblation.py:114-119)."""

    need_features = True

    def __init__(self, in_channels: int, in_channels_rrdb: int,
                 hidden_channels: int = 64, affine_eps: float = 1e-4,
                 compute_dtype=None):
        self.in_ch = in_channels
        self.ch_nn = in_channels // 2
        self.ch_co = in_channels - self.ch_nn
        self.eps = affine_eps
        self.f_affine = _FNet(self.ch_nn + in_channels_rrdb, self.ch_co * 2,
                              hidden_channels, compute_dtype=compute_dtype)
        self.f_features = _FNet(in_channels_rrdb, in_channels * 2,
                                hidden_channels, compute_dtype=compute_dtype)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"f_affine": self.f_affine.init(k1),
                "f_features": self.f_features.init(k2)}

    def _feature_affine(self, params, ft):
        h = self.f_features.apply(params["f_features"], ft)
        shift, scale = split_channels(h, "cross")
        return jax.nn.sigmoid(scale + 2.0) + self.eps, shift

    def _self_affine(self, params, z1, ft):
        h = self.f_affine.apply(params["f_affine"],
                                jnp.concatenate([z1, ft], axis=1))
        shift, scale = split_channels(h, "cross")
        scale = jax.nn.sigmoid(scale + 2.0 + z1) + self.eps
        return scale, shift + z1

    def forward(self, params, x, logdet, *, ft, **_):
        scale_ft, shift_ft = self._feature_affine(params, ft)
        z = (x + shift_ft) * scale_ft
        logdet = logdet + sum_except_batch(jnp.log(scale_ft))

        z1, z2 = z[:, : self.ch_nn], z[:, self.ch_nn :]
        scale, shift = self._self_affine(params, z1, ft)
        z2 = (z2 + shift) * scale
        logdet = logdet + sum_except_batch(jnp.log(scale))
        return jnp.concatenate([z1, z2], axis=1), logdet

    def inverse(self, params, y, logdet, *, ft, **_):
        z1, z2 = y[:, : self.ch_nn], y[:, self.ch_nn :]
        scale, shift = self._self_affine(params, z1, ft)
        z2 = z2 / scale - shift
        logdet = logdet - sum_except_batch(jnp.log(scale))
        z = jnp.concatenate([z1, z2], axis=1)

        scale_ft, shift_ft = self._feature_affine(params, ft)
        x = z / scale_ft - shift_ft
        logdet = logdet - sum_except_batch(jnp.log(scale_ft))
        return x, logdet

    def ddi(self, params, x, logdet, *, ft):
        p_ff, _ = self.f_features.ddi(params["f_features"], ft)
        params = dict(params, f_features=p_ff)
        scale_ft, shift_ft = self._feature_affine(params, ft)
        z = (x + shift_ft) * scale_ft
        logdet = logdet + sum_except_batch(jnp.log(scale_ft))
        z1, z2 = z[:, : self.ch_nn], z[:, self.ch_nn :]
        p_fa, _ = self.f_affine.ddi(params["f_affine"],
                                    jnp.concatenate([z1, ft], axis=1))
        params = dict(params, f_affine=p_fa)
        scale, shift = self._self_affine(params, z1, ft)
        z2 = (z2 + shift) * scale
        logdet = logdet + sum_except_batch(jnp.log(scale))
        return params, jnp.concatenate([z1, z2], axis=1), logdet


# --------------------------------------------------------------------------
# Conditional split (Split.py:26-86)
# --------------------------------------------------------------------------
class Split2dCond:
    def __init__(self, num_channels: int, *, logs_eps: float = 0.0,
                 cond_channels: int = 0, consume_ratio: float = 0.5,
                 position: Optional[str] = None):
        self.num_channels_consume = int(round(num_channels * consume_ratio))
        self.num_channels_pass = num_channels - self.num_channels_consume
        self.conv = Conv2dZeros(self.num_channels_pass + cond_channels,
                                self.num_channels_consume * 2, 3)
        self.logs_eps = logs_eps
        self.position = position

    def init(self, key):
        return {"conv": self.conv.init(key)}

    def _prior(self, params, z1, ft):
        z = z1 if ft is None else jnp.concatenate([z1, ft], axis=1)
        h = self.conv.apply(params["conv"], z)
        return split_channels(h, "cross")

    def _exp_eps(self, logs):
        return jnp.exp(logs) + self.logs_eps

    def forward(self, params, x, logdet, *, ft=None, **_):
        z1 = x[:, : self.num_channels_pass]
        z2 = x[:, self.num_channels_pass :]
        mean, logs = self._prior(params, z1, ft)
        eps = (z2 - mean) / self._exp_eps(logs)
        logdet = logdet + GaussianDiag.logp(mean, logs, z2)
        return z1, logdet, eps

    def inverse(self, params, z1, logdet, *, ft=None, eps=None, rng=None,
                eps_std=None, **_):
        mean, logs = self._prior(params, z1, ft)
        if eps is None:
            eps = GaussianDiag.sample_eps(rng, mean.shape, eps_std, mean.dtype)
        z2 = mean + self._exp_eps(logs) * eps
        z = jnp.concatenate([z1, z2], axis=1)
        logdet = logdet - GaussianDiag.logp(mean, logs, z2)
        return z, logdet


# --------------------------------------------------------------------------
# FlowStep (SRFlow variant)
# --------------------------------------------------------------------------
class SRFlowStep:
    def __init__(self, in_channels: int, *, coupling: str, in_channels_rrdb: int,
                 hidden_channels: int = 64, actnorm_scale: float = 1.0,
                 use_attention: bool = True, attn_heads: int = 5,
                 attn_score: str = "softmax", affine_eps: float = 1e-4,
                 compute_dtype=None, sub_remat: bool = False):
        self.actnorm = ActNorm(in_channels, actnorm_scale)
        self.invconv = NonLUInvConv(in_channels)
        self.coupling_type = coupling
        # "noattn"-style remat: only the coupling's conv stacks recompute in
        # backward; attention/actnorm/invconv outputs are plain residuals
        self.sub_remat = sub_remat
        if coupling == "CondAffineSeparatedAndCond":
            self.affine = CondAffineSeparatedAndCond(
                in_channels, in_channels_rrdb, hidden_channels, affine_eps,
                compute_dtype=compute_dtype)
        elif coupling == "noCoupling":
            self.affine = None
        else:
            raise ValueError(coupling)
        self.use_attention = use_attention
        if use_attention:
            # SRFlow's fork wires the 5-head softmax transformer into every
            # FlowStep (models/modules/transformer.py:110-116, FlowStep.py
            # 80-81,113-114): scale 2000, diagonal offset 1.01.
            kw = dict(offset_init=1.01, scale_init=2000.0) \
                if attn_score == "softmax" else {}
            self.attn1 = InvertibleAttention(in_channels, attn_heads,
                                             score=attn_score, **kw)
            self.attn2 = InvertibleAttention(in_channels, attn_heads,
                                             score=attn_score, **kw)

    def init(self, key):
        ks = jax.random.split(key, 5)
        p = {"actnorm": self.actnorm.init(ks[0]), "invconv": self.invconv.init(ks[1])}
        if self.affine is not None:
            p["affine"] = self.affine.init(ks[2])
        if self.use_attention:
            p["attn1"] = self.attn1.init(ks[3])
            p["attn2"] = self.attn2.init(ks[4])
        return p

    def _affine_fn(self, inverse: bool):
        fn = self.affine.inverse if inverse else self.affine.forward
        wrapped = lambda p, z, l, f: fn(p, z, l, ft=f)
        return jax.checkpoint(wrapped) if self.sub_remat else wrapped

    def forward(self, params, z, logdet, *, ft=None, **_):
        z, logdet = self.actnorm.forward(params["actnorm"], z, logdet)
        z, logdet = self.invconv.forward(params["invconv"], z, logdet)
        if self.affine is not None:
            z, logdet = self._affine_fn(False)(params["affine"], z, logdet, ft)
        if self.use_attention:
            z, logdet = self.attn1.forward(params["attn1"], z, logdet)
            z, logdet = self.attn2.forward(params["attn2"], z, logdet, permute=True)
        return z, logdet

    def inverse(self, params, z, logdet, *, ft=None, **_):
        if self.use_attention:
            z, logdet = self.attn2.inverse(params["attn2"], z, logdet, permute=True)
            z, logdet = self.attn1.inverse(params["attn1"], z, logdet)
        if self.affine is not None:
            z, logdet = self._affine_fn(True)(params["affine"], z, logdet, ft)
        z, logdet = self.invconv.inverse(params["invconv"], z, logdet)
        z, logdet = self.actnorm.inverse(params["actnorm"], z, logdet)
        return z, logdet

    def ddi(self, params, z, logdet, *, ft=None):
        p_an, z, logdet = self.actnorm.ddi(params["actnorm"], z, logdet)
        params = dict(params, actnorm=p_an)
        z, logdet = self.invconv.forward(params["invconv"], z, logdet)
        if self.affine is not None:
            p_aff, z, logdet = self.affine.ddi(params["affine"], z, logdet, ft=ft)
            params = dict(params, affine=p_aff)
        if self.use_attention:
            z, logdet = self.attn1.forward(params["attn1"], z, logdet)
            z, logdet = self.attn2.forward(params["attn2"], z, logdet, permute=True)
        return params, z, logdet


# --------------------------------------------------------------------------
# FlowUpsamplerNet + SRFlowNet
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class SRFlowConfig:
    scale: int = 4
    hr_size: int = 160
    in_nc: int = 3
    K: int = 16
    L: int = 3
    hidden_channels: int = 64
    coupling: str = "CondAffineSeparatedAndCond"
    additional_flow_no_affine: int = 2
    use_attention: bool = True
    attn_heads: int = 5  # SRFlow-side transformer has 5 q/k heads
    attn_score: str = "softmax"  # models/modules/transformer.py scoring
    affine_eps: float = 1e-4
    # split options (network_G.flow.split.*)
    split_enable: bool = True
    consume_ratio: float = 0.5
    logs_eps: float = 0.0
    split_conditional: bool = False
    correct_splits: bool = False
    # RRDB conditioning
    rrdb_nf: int = 64
    rrdb_nb: int = 23
    rrdb_gc: int = 32
    stack_blocks: Tuple[int, ...] = (1, 8, 15, 22)
    stack_concat: bool = True
    quant: int = 255
    noise_quant: bool = True
    train_rrdb_delay: float = 0.5  # fraction of niter before RRDB unfreezes
    # TPU compilation/memory controls (see MarScfConfig)
    scan_steps: bool = True
    remat: bool = True
    # lax.scan unroll factor for the K-step scans: 0 = FULL unroll (capped
    # at K <= 8 — larger K falls back to rolled), 1 = rolled, >1 partial.
    # The flagship's winning r4 pairing was full unroll x sub-step remat
    # ("noattn" below); A/B'd here per VERDICT r4 item 4.
    scan_unroll: int = 1
    # "body": jax.checkpoint around the whole K-step scan body (r3 default).
    # "noattn": NO scan-body checkpoint; only the CondAffine coupling's conv
    # stacks are sub-checkpointed, so attention/actnorm/invconv outputs
    # cross the scan (or the unrolled program) as ordinary residuals — the
    # mAR-SCF winner's remat shape ported to the SRFlow step.
    remat_mode: str = "body"
    # named-save remat policy for the K-step scan checkpoint ("" = recompute
    # everything, the r3 default). "wcast" keeps the tiny bf16 weight casts
    # (only populated when compute_dtype=bfloat16).
    remat_save_names: str = ""
    # "bfloat16" runs the RRDB encoder and the coupling hidden convs on the
    # MXU in bf16 (fp32 scale/shift heads and logdet math) — the flagship
    # mAR-SCF precision discipline ported to SRFlow (r3 VERDICT item 6).
    compute_dtype: str = "float32"


def level_to_name(scale: int) -> Dict[int, str]:
    """FlowUpsamplerNet.py:49-74."""
    if scale == 16:
        return {0: "fea_up16", 1: "fea_up8", 2: "fea_up4", 3: "fea_up2", 4: "fea_up1"}
    if scale == 8:
        return {0: "fea_up8", 1: "fea_up4", 2: "fea_up2", 3: "fea_up1", 4: "fea_up0"}
    return {0: "fea_up4", 1: "fea_up2", 2: "fea_up1", 3: "fea_up0", 4: "fea_up-1"}


class FlowUpsamplerNet:
    @staticmethod
    def _dt(cfg):
        return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    def __init__(self, cfg: SRFlowConfig):
        self.cfg = cfg
        # conditioning width: nf per feature + nf per stacked block when
        # concatenated (the reference hard-codes nf=64: FlowUpsamplerNet.py
        # get_n_rrdb_channels; generalized to any nf here)
        n_rrdb = (cfg.rrdb_nf * (len(cfg.stack_blocks) + 1)
                  if cfg.stack_concat else cfg.rrdb_nf)
        self.n_rrdb = n_rrdb
        self.level_names = level_to_name(cfg.scale)

        c = cfg.in_nc
        h = w = cfg.hr_size
        correction = 0 if cfg.correct_splits else 1
        self.structure = []  # list of (kind, module, level) in forward order
        for level in range(1, cfg.L + 1):
            c, h, w = c * 4, h // 2, w // 2
            self.structure.append(("squeeze", Squeeze(2), level))
            for _ in range(cfg.additional_flow_no_affine):
                self.structure.append((
                    "step",
                    SRFlowStep(c, coupling="noCoupling", in_channels_rrdb=0,
                               hidden_channels=cfg.hidden_channels,
                               use_attention=cfg.use_attention,
                               attn_heads=cfg.attn_heads,
                               attn_score=cfg.attn_score,
                               compute_dtype=self._dt(cfg)), level))
            cond_step = SRFlowStep(c, coupling=cfg.coupling,
                                   in_channels_rrdb=n_rrdb,
                                   hidden_channels=cfg.hidden_channels,
                                   use_attention=cfg.use_attention,
                                   attn_heads=cfg.attn_heads,
                                   attn_score=cfg.attn_score,
                                   affine_eps=cfg.affine_eps,
                                   compute_dtype=self._dt(cfg),
                                   sub_remat=(cfg.remat
                                              and cfg.remat_mode == "noattn"))
            if cfg.scan_steps:
                self.structure.append(("kscan", cond_step, level))
            else:
                for _ in range(cfg.K):
                    self.structure.append(("step", cond_step, level))
            if cfg.split_enable and level < cfg.L - correction:
                split = Split2dCond(c, logs_eps=cfg.logs_eps,
                                    consume_ratio=cfg.consume_ratio,
                                    position=(self.level_names[level]
                                              if cfg.split_conditional else None),
                                    cond_channels=0)
                self.structure.append(("split", split, level))
                c = split.num_channels_pass
        self.final_shape = (c, h, w)

    def init(self, key):
        from .marscf import stack_params

        n = len(self.structure) * max(self.cfg.K, 1)
        keys = jax.random.split(key, n)
        params, ki = [], 0
        for kind, m, _ in self.structure:
            if kind == "squeeze":
                params.append({})
            elif kind == "kscan":
                ps = [m.init(keys[ki + j]) for j in range(self.cfg.K)]
                ki += self.cfg.K
                params.append(stack_params(ps))
            else:
                params.append(m.init(keys[ki]))
                ki += 1
        return {"layers": params}

    def _run_kscan(self, mod, stacked, z, logdet, ft, inverse=False):
        def body(carry, p_step):
            z, logdet = carry
            fn = mod.inverse if inverse else mod.forward
            z, logdet = fn(p_step, z, logdet, ft=ft)
            return (z, logdet), None

        if self.cfg.remat and self.cfg.remat_mode == "body":
            policy = None
            if self.cfg.remat_save_names:
                policy = jax.checkpoint_policies.save_only_these_names(
                    *self.cfg.remat_save_names.split(","))
            body = jax.checkpoint(body, policy=policy)
        # scan_unroll=0 = full unroll up to K=8 (the winning mAR-SCF program
        # shape: no scan residual stacking / named-save barriers); larger K
        # falls back to the rolled scan like MarScfFlow
        unroll = (True if (self.cfg.scan_unroll == 0 and self.cfg.K <= 8)
                  else max(1, self.cfg.scan_unroll))
        (z, logdet), _ = jax.lax.scan(body, (z, logdet), stacked,
                                      reverse=inverse, unroll=unroll)
        return z, logdet

    def _ft(self, rrdb_results, level):
        return rrdb_results[self.level_names[level]]

    def encode(self, params, gt, rrdb_results, logdet, collect_eps: bool = False):
        z = gt
        epses = []
        for (kind, mod, level), p in zip(self.structure, params["layers"]):
            if kind == "squeeze":
                z, logdet = mod.forward(p, z, logdet)
            elif kind == "step":
                z, logdet = mod.forward(p, z, logdet, ft=self._ft(rrdb_results, level))
            elif kind == "kscan":
                z, logdet = self._run_kscan(mod, p, z, logdet,
                                            self._ft(rrdb_results, level))
            else:  # split
                ft = None
                if mod.position is not None:
                    ft = rrdb_results[mod.position]
                z, logdet, eps = mod.forward(p, z, logdet, ft=ft)
                epses.append(eps)
        if collect_eps:
            return z, logdet, epses
        return z, logdet

    def decode(self, params, z, rrdb_results, logdet, *, rng=None, eps_std=None,
               epses=None):
        eps_stack = list(epses) if epses is not None else None
        for (kind, mod, level), p in zip(reversed(self.structure),
                                         reversed(params["layers"])):
            if kind == "squeeze":
                z, logdet = mod.inverse(p, z, logdet)
            elif kind == "step":
                z, logdet = mod.inverse(p, z, logdet, ft=self._ft(rrdb_results, level))
            elif kind == "kscan":
                z, logdet = self._run_kscan(mod, p, z, logdet,
                                            self._ft(rrdb_results, level),
                                            inverse=True)
            else:
                ft = None
                if mod.position is not None:
                    ft = rrdb_results[mod.position]
                eps = eps_stack.pop() if eps_stack else None
                sub = None
                if rng is not None:
                    rng, sub = jax.random.split(rng)
                z, logdet = mod.inverse(p, z, logdet, ft=ft, eps=eps, rng=sub,
                                        eps_std=eps_std)
        return z, logdet

    def ddi(self, params, gt, rrdb_results, logdet):
        from .marscf import stack_params, unstack_params

        z = gt
        new_layers = []
        for (kind, mod, level), p in zip(self.structure, params["layers"]):
            if kind == "squeeze":
                z, logdet = mod.forward(p, z, logdet)
                new_layers.append(p)
            elif kind == "step":
                p, z, logdet = mod.ddi(p, z, logdet, ft=self._ft(rrdb_results, level))
                new_layers.append(p)
            elif kind == "kscan":
                ft = self._ft(rrdb_results, level)
                plist = unstack_params(p, self.cfg.K)
                new_list = []
                for pj in plist:
                    pj, z, logdet = mod.ddi(pj, z, logdet, ft=ft)
                    new_list.append(pj)
                new_layers.append(stack_params(new_list))
            else:
                ft = rrdb_results[mod.position] if mod.position is not None else None
                z, logdet, _ = mod.forward(p, z, logdet, ft=ft)
                new_layers.append(p)
        return dict(params, layers=new_layers)


@register_model("srflow")
class SRFlowNet:
    """RRDB encoder + conditional flow; nll in bits/dim over HR pixels."""

    def __init__(self, cfg: SRFlowConfig):
        self.cfg = cfg
        self.rrdb = RRDBNet(RRDBConfig(
            in_nc=cfg.in_nc, out_nc=3, nf=cfg.rrdb_nf, nb=cfg.rrdb_nb,
            gc=cfg.rrdb_gc, scale=cfg.scale, stack_blocks=cfg.stack_blocks,
            fea_up0=(cfg.scale <= 8), fea_up_n1=(cfg.scale == 4),
            compute_dtype=cfg.compute_dtype))
        self.flow = FlowUpsamplerNet(cfg)
        # the reference normalizes by H*W pixels, NOT C*H*W dims
        # (thops.pixels = size(2)*size(3), SRFlowNet_arch.py:88,112): its
        # "nll" is bits per PIXEL. Kept for metric parity.
        self.num_pixels = cfg.hr_size * cfg.hr_size

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"rrdb": self.rrdb.init(k1), "flow": self.flow.init(k2)}

    def rrdb_preprocess(self, params, lr):
        """RRDB features + stackRRDB concat (SRFlowNet_arch.py:118-138)."""
        cfg = self.cfg
        results = self.rrdb.apply(params["rrdb"], lr, get_steps=True)
        if cfg.stack_blocks and cfg.stack_concat:
            concat = jnp.concatenate(
                [results[f"block_{i}"] for i in cfg.stack_blocks], axis=1)
            keys = ["last_lr_fea", "fea_up1", "fea_up2", "fea_up4"]
            if "fea_up0" in results:
                keys.append("fea_up0")
            if "fea_up-1" in results:
                keys.append("fea_up-1")
            if cfg.scale >= 8:
                keys.append("fea_up8")
            if cfg.scale == 16:
                keys.append("fea_up16")
            for k in keys:
                h, w = results[k].shape[2], results[k].shape[3]
                # F.interpolate default (nearest, floor indexing) — also for
                # DOWN-sampled keys like fea_up0 (SRFlowNet_arch.py:130-137)
                up = nearest_resize(concat, h, w)
                results[k] = jnp.concatenate([results[k], up], axis=1)
        return results

    def forward(self, params, gt, lr, *, rng=None, train=False, lr_enc=None):
        """Returns (z, nll bits/dim, logdet)."""
        cfg = self.cfg
        if lr_enc is None:
            lr_enc = self.rrdb_preprocess(params, lr)
        logdet = jnp.zeros((gt.shape[0],), jnp.float32)
        z = gt
        if cfg.noise_quant and rng is not None:
            z = z + (jax.random.uniform(rng, z.shape, z.dtype) - 0.5) / cfg.quant
        logdet = logdet - math.log(cfg.quant) * self.num_pixels
        z, logdet = self.flow.encode(params["flow"], z, lr_enc, logdet)
        objective = logdet + GaussianDiag.logp(None, None, z)
        nll = -objective / (math.log(2.0) * self.num_pixels)
        return z, nll, logdet

    def reverse(self, params, lr, z=None, *, rng=None, eps_std: float = 1.0,
                lr_enc=None, epses=None):
        """SR synthesis from latent z (or sampled N(0, eps_std))."""
        if lr_enc is None:
            lr_enc = self.rrdb_preprocess(params, lr)
        batch = lr.shape[0]
        c, h, w = self.flow.final_shape
        sub = None
        if rng is not None:
            rng, sub = jax.random.split(rng)
        if z is None:
            z = GaussianDiag.sample_eps(sub, (batch, c, h, w), eps_std)
        logdet = jnp.zeros((batch,), jnp.float32)
        sr, logdet = self.flow.decode(params["flow"], z, lr_enc, logdet,
                                      rng=rng, eps_std=eps_std, epses=epses)
        return sr, logdet

    def ddi(self, params, gt, lr, rng):
        lr_enc = self.rrdb_preprocess(params, lr)
        z = gt
        if self.cfg.noise_quant:
            z = z + (jax.random.uniform(rng, z.shape, z.dtype) - 0.5) / self.cfg.quant
        logdet = jnp.zeros((gt.shape[0],), jnp.float32)
        p_flow = self.flow.ddi(params["flow"], z, lr_enc, logdet)
        return dict(params, flow=p_flow)
