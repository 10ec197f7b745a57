"""mAR-SCF: multi-scale autoregressive normalizing flow for images.

Reference: marscf_main.py (FlowStep 35-113, FlowNet 116-175, MarScfFlow
178-220). Forward step order: actnorm -> invconv(PLU) -> attention ->
attention(permute) -> coupling -> [tuple-flip for MixLogCDF]; levels are
squeeze -> K steps -> channel split, with the split-off half scored by the
ConvLSTM channel-AR prior.

Differences from the reference, by design (SURVEY.md §2.1 "known quirks"):
  - invconv log-det uses the correct H*W pixel count (reference uses W*W);
  - actnorm data-dependent init is an explicit eager `ddi` pass;
  - sampling honors eps_std (the reference's ConvLSTM sampler ignores it).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.actnorm import ActNorm
from ..ops.attention import InvertibleAttention
from ..ops.basic import GaussianDiag, Squeeze, TupleFlip, split_channels
from ..ops.coupling import AffineCoupling, Split2dGaussian
from ..ops.invconv import InvConv1x1
from ..ops.mixlogcdf import MixLogCDFCoupling
from .prior import ChannelPriorMultiScale
from . import register_model


def stack_params(param_list):
    """Stack K structurally-identical param pytrees along a new leading axis
    (enables lax.scan over flow steps: one compiled body per level)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_list)


def unstack_params(stacked, k):
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(k)]


@dataclass(frozen=True)
class MarScfConfig:
    image_shape: Tuple[int, int, int] = (32, 32, 3)  # H, W, C
    L: int = 3
    K: int = 4
    hidden_channels: int = 96  # the reference's --C
    coupling: str = "mixlogcdf"  # "affine" | "mixlogcdf"
    use_attention: bool = True
    attn_heads: int = 3
    # MixLogCDF network (marscf_main.py:40-41)
    num_blocks: int = 10
    num_components: int = 32
    drop_prob: float = 0.2
    # Prior
    prior: str = "convlstm"  # "convlstm" | "gaussian"
    prior_hidden: int = 32
    prior_layers: int = 3
    prior_dp_rate: float = 0.0
    actnorm_scale: float = 1.0
    # TPU compilation/memory controls: scan over the K identical steps of a
    # level (compile one body per level, not K), rematerialize the scan body
    # on the backward pass.
    scan_steps: bool = True
    # lax.scan unroll factor for the K-step scan: >1 replicates the body at
    # compile time, 0 = FULL unroll (the default since r4): under the
    # noattn remat mode below, fully unrolling eliminates the scan's
    # residual stacking AND the named-save barriers at once — 1096 vs 997
    # img/s on the flagship (docs/BENCHMARKS.md round-4 sweep). Partial
    # unroll keeps the scan and LOSES (879 at unroll=2); under body-mode
    # remat full unroll is merely flat (1000). 1 = rolled.
    scan_unroll: int = 0
    # lax.scan _split_transpose for the K-step scan: splits the scan's
    # transpose (the backward) into a forward-replay scan plus a separate
    # gradient scan, which can reschedule the rematted-residual stacking
    # copies (the ~32 ms copy bucket, docs/BENCHMARKS.md r4 anatomy).
    # Opt-in experiment knob; default off.
    scan_split_transpose: bool = False
    # same idea for the ConvLSTM prior's wavefront scan over channel-waves
    # (T+L-1 = 8/14/50 tiny-conv steps per level at flagship size): >1 lets
    # XLA fuse gate math across waves and drop carry-stacking copies;
    # 0 = FULL unroll — the default: measured 690 -> 771 img/s (+12%)
    # end-to-end on the flagship train step, with unroll 8/16 in between
    # (docs/BENCHMARKS.md round-3 levers). Also unrolls the ancestral-
    # sampling channel scan. Set 1 to restore the rolled scan.
    prior_scan_unroll: int = 0
    remat: bool = True
    # limit remat to specific levels (0-based); None = all levels when
    # remat=True. Level 0 (largest spatial extent) holds most of the
    # activation memory, so e.g. (0,) rematerializes only it and keeps the
    # cheap levels' activations resident.
    remat_levels: Optional[Tuple[int, ...]] = None
    # remat granularity: "" = recompute everything; names are comma-
    # separated. "remat_ckpt" keeps the named activations (coupling-block
    # outputs) so the backward recomputes only within a block; "wcast" keeps
    # the tiny normalized/cast effective weights (they otherwise re-emit
    # ~1.5k sub-[192] kernels per backward, docs/BENCHMARKS.md r3 anatomy).
    # "attn_out" keeps each coupling-block attention output (B*S*C bf16,
    # ~0.7 GB total at b256 flagship) so the backward restores instead of
    # re-running the fused attention forward kernels: +7.6% on TPU v5e
    # (748 -> 805 img/s A/B, docs/BENCHMARKS.md).
    remat_save_names: str = "remat_ckpt,wcast,attn_out"
    # "body": jax.checkpoint around the whole K-step scan body with the
    # named-save policy above. "blocks": per-ConvAttnBlock jax.checkpoint
    # instead — same recompute granularity, but block boundaries are saved
    # as ordinary scan values rather than named-save barrier copies (the
    # barriers cost ~92 ms/step on TPU, scripts/profile_train.py).
    # "noattn": NO scan-body checkpoint; instead sub-checkpoint only the
    # conv branches, the layer norms, and the fp32 mixture head inside each
    # coupling, leaving the fused-attention and gate matmul outputs to cross
    # the scan as ORDINARY stacked residuals. Motivation: at the r4 995
    # plateau the attn_out named-save barrier copies measured 52 ms/step
    # (bf16[256,256,96] saves moving at ~12 GB/s) + 25 ms remat wrappers —
    # the sub-checkpoints keep the no-remat OOM classes (fp32 mixture
    # params, conv-chain intermediates) out of HBM while dropping every
    # named-save barrier. DEFAULT since r4, paired with scan_unroll=0:
    # noattn x full unroll is the 1096 img/s headline mode (the pair only
    # wins together — see scan_unroll above).
    remat_mode: str = "noattn"
    # "bfloat16" runs the coupling networks on the MXU in bf16 (log-det math
    # stays fp32); "float32" is the exact reference-precision path.
    compute_dtype: str = "float32"
    # one-launch GatedConv+residual Pallas kernel (concat-ELU, 3x3 conv as
    # tap matmuls, Dropout2d, GLU gate, residual all in VMEM; custom VJP
    # saves only inputs+weights) — attacks the 86.7 ms elementwise-fusion
    # bucket of the r4 winner anatomy. A/B knob; see docs/BENCHMARKS.md.
    fused_gated_conv: bool = False
    # Hoist weight normalization out of the K-step scan: normalize each WN
    # layer's stacked (K, ...) params in ONE fused kernel before the scan
    # instead of per iteration + per rematted backward (ops/conv.py
    # precompute_wn — kills ~2k tiny per-channel kernels/step of the r3
    # anatomy). Numerics are identical (same fp32 norm, same cast order).
    precompute_wn: bool = False


class FlowStep:
    def __init__(self, cfg: MarScfConfig, channels: int):
        self.cfg = cfg
        self.actnorm = ActNorm(channels, cfg.actnorm_scale)
        self.invconv = InvConv1x1(channels)
        self.use_attention = cfg.use_attention
        if cfg.use_attention:
            self.attn1 = InvertibleAttention(channels, cfg.attn_heads)
            self.attn2 = InvertibleAttention(channels, cfg.attn_heads)
        if cfg.coupling == "mixlogcdf":
            compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                             else None)
            self.coupling = MixLogCDFCoupling(
                channels, cfg.hidden_channels, num_blocks=cfg.num_blocks,
                num_components=cfg.num_components, drop_prob=cfg.drop_prob,
                compute_dtype=compute_dtype,
                block_remat=cfg.remat and cfg.remat_mode == "blocks",
                sub_remat=cfg.remat and cfg.remat_mode == "noattn",
                fused_gconv=cfg.fused_gated_conv)
            self.tuple_flip = TupleFlip()
        elif cfg.coupling == "affine":
            self.coupling = AffineCoupling(channels, channels, cfg.hidden_channels)
            self.tuple_flip = None
        else:
            raise ValueError(cfg.coupling)

    def init(self, key):
        ks = jax.random.split(key, 5)
        p = {
            "actnorm": self.actnorm.init(ks[0]),
            "invconv": self.invconv.init(ks[1]),
            "coupling": self.coupling.init(ks[2]),
        }
        if self.use_attention:
            p["attn1"] = self.attn1.init(ks[3])
            p["attn2"] = self.attn2.init(ks[4])
        return p

    def forward(self, params, x, logdet, *, rng=None, train=False):
        x, logdet = self.actnorm.forward(params["actnorm"], x, logdet)
        x, logdet = self.invconv.forward(params["invconv"], x, logdet)
        if self.use_attention:
            x, logdet = self.attn1.forward(params["attn1"], x, logdet)
            x, logdet = self.attn2.forward(params["attn2"], x, logdet, permute=True)
        x, logdet = self.coupling.forward(params["coupling"], x, logdet,
                                          rng=rng, train=train)
        if self.tuple_flip is not None:
            x, logdet = self.tuple_flip.forward({}, x, logdet)
        return x, logdet

    def inverse(self, params, y, logdet, *, rng=None, train=False):
        if self.tuple_flip is not None:
            y, logdet = self.tuple_flip.inverse({}, y, logdet)
        y, logdet = self.coupling.inverse(params["coupling"], y, logdet,
                                          rng=rng, train=train)
        if self.use_attention:
            y, logdet = self.attn2.inverse(params["attn2"], y, logdet, permute=True)
            y, logdet = self.attn1.inverse(params["attn1"], y, logdet)
        y, logdet = self.invconv.inverse(params["invconv"], y, logdet)
        y, logdet = self.actnorm.inverse(params["actnorm"], y, logdet)
        return y, logdet

    def ddi(self, params, x, logdet):
        """Eager data-dependent-init pass mirroring forward()."""
        p_an, x, logdet = self.actnorm.ddi(params["actnorm"], x, logdet)
        params = dict(params, actnorm=p_an)
        x, logdet = self.invconv.forward(params["invconv"], x, logdet)
        if self.use_attention:
            x, logdet = self.attn1.forward(params["attn1"], x, logdet)
            x, logdet = self.attn2.forward(params["attn2"], x, logdet, permute=True)
        if hasattr(self.coupling, "ddi"):
            p_c, x, logdet = self.coupling.ddi(params["coupling"], x, logdet)
            params = dict(params, coupling=p_c)
        else:
            x, logdet = self.coupling.forward(params["coupling"], x, logdet)
        if self.tuple_flip is not None:
            x, logdet = self.tuple_flip.forward({}, x, logdet)
        return params, x, logdet


@register_model("marscf")
class MarScfFlow:
    """Image density model in bits/dim; forward = encode, inverse = sample."""

    def __init__(self, cfg: MarScfConfig):
        from dataclasses import replace as _replace
        if (cfg.remat and cfg.remat_mode == "noattn" and cfg.scan_steps
                and cfg.scan_unroll == 0 and cfg.K > 8):
            # the r4 default pairing (noattn x FULL unroll) only holds up
            # to the K<=8 unroll cap; a rolled noattn scan stacks the
            # attention/gate residuals ~K-fold (the body mode remats
            # them), so noattn + scan_unroll=0 at K > 8 ALWAYS falls back
            # to body remat — including when the caller set those values
            # explicitly (defaults and explicit-equal-to-default are
            # indistinguishable here). To keep noattn at large K, pass
            # scan_unroll=K (true full unroll) or remat_mode="body"/
            # "blocks" deliberately. The fallback is logged so it is
            # never silent (ADVICE r4).
            import logging
            logging.getLogger(__name__).warning(
                "MarScfConfig: remat_mode 'noattn' with scan_unroll=0 at "
                "K=%d (>8) falls back to remat_mode='body' (rolled scan "
                "would stack attention residuals K-fold); set "
                "scan_unroll=K to force full unroll with noattn.", cfg.K)
            cfg = _replace(cfg, remat_mode="body")
        self.cfg = cfg
        h, w, c = cfg.image_shape
        assert c in (1, 3)
        self.squeeze = Squeeze(2)
        self.levels = []  # per level: list of FlowStep
        self.level_shapes = []  # (C, H, W) during that level's steps
        for i in range(cfg.L):
            c, h, w = c * 4, h // 2, w // 2
            self.levels.append([FlowStep(cfg, c) for _ in range(cfg.K)])
            self.level_shapes.append((c, h, w))
            if i < cfg.L - 1:
                c = c // 2
        self.final_shape = (c, h, w)

        if cfg.prior == "convlstm":
            hh, ww, cc = cfg.image_shape
            self.prior = ChannelPriorMultiScale(
                cc, hh, ww, cfg.L, hidden_size=cfg.prior_hidden,
                dp_rate=cfg.prior_dp_rate, num_layers=cfg.prior_layers,
                compute_dtype=(jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                               else None),
                scan_unroll=cfg.prior_scan_unroll)
            self.split_priors = None
        elif cfg.prior == "gaussian":
            self.prior = None
            self.split_priors = [Split2dGaussian(self.level_shapes[i][0])
                                 for i in range(cfg.L - 1)]
        else:
            raise ValueError(cfg.prior)

        h_img, w_img, c_img = cfg.image_shape
        self.num_dims = h_img * w_img * c_img

    # -- params --------------------------------------------------------------
    def init(self, key):
        n_steps = sum(len(steps) for steps in self.levels)
        keys = jax.random.split(key, n_steps + 1 + self.cfg.L)
        it = iter(keys)
        params = {"levels": []}
        for steps in self.levels:
            step_params = [s.init(next(it)) for s in steps]
            if self.cfg.scan_steps:
                params["levels"].append({"steps": stack_params(step_params)})
            else:
                params["levels"].append({"steps": step_params})
        if self.prior is not None:
            params["prior"] = self.prior.init(next(it))
        else:
            params["splits"] = [sp.init(next(it)) for sp in self.split_priors]
        return params

    # -- scan over the K steps of one level -----------------------------------
    def _run_level_steps(self, level_idx, stacked_or_list, z, logdet, *, rng,
                         train, inverse=False):
        steps = self.levels[level_idx]
        k = len(steps)
        if not self.cfg.scan_steps:
            order = range(k) if not inverse else reversed(range(k))
            rngs = (jax.random.split(rng, k) if rng is not None else [None] * k)
            for j in order:
                fn = steps[j].inverse if inverse else steps[j].forward
                z, logdet = fn(stacked_or_list[j], z, logdet, rng=rngs[j],
                               train=train)
            return z, logdet

        step = steps[0]  # all K steps share structure/shapes
        if self.cfg.precompute_wn:
            from ..ops.conv import precompute_wn
            dt = (jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16"
                  else jnp.float32)
            stacked_or_list = precompute_wn(stacked_or_list, dt)
        if rng is not None:
            xs = (stacked_or_list, jax.random.split(rng, k))
        else:
            xs = (stacked_or_list,)

        def body(carry, xs):
            z, logdet = carry
            p_step = xs[0]
            key = xs[1] if len(xs) > 1 else None
            fn = step.inverse if inverse else step.forward
            z, logdet = fn(p_step, z, logdet, rng=key, train=train)
            return (z, logdet), None

        remat_this = (self.cfg.remat and self.cfg.remat_mode == "body"
                      and (self.cfg.remat_levels is None
                           or level_idx in self.cfg.remat_levels))
        if remat_this:
            policy = None
            if self.cfg.remat_save_names:
                policy = jax.checkpoint_policies.save_only_these_names(
                    *self.cfg.remat_save_names.split(","))
            body = jax.checkpoint(body, policy=policy)
        scan_kwargs = {}
        if self.cfg.scan_split_transpose:
            # _split_transpose is a private, unstable lax.scan kwarg; only the
            # opt-in experimental path may depend on it (ADVICE r3).
            scan_kwargs["_split_transpose"] = True
        # scan_unroll=0 = full unroll, but only up to K=8: the unrolled
        # program grows linearly in K and the flagship win (K=4) does not
        # justify minute-scale compile blowups at e.g. the CLI's K=32
        # default — larger K falls back to the rolled scan (set an explicit
        # scan_unroll to override).
        unroll = (True if (self.cfg.scan_unroll == 0 and k <= 8)
                  else max(1, self.cfg.scan_unroll))
        (z, logdet), _ = jax.lax.scan(
            body, (z, logdet), xs, reverse=inverse,
            unroll=unroll, **scan_kwargs)
        return z, logdet

    # -- density -------------------------------------------------------------
    def encode(self, params, z, logdet, *, rng=None, train=False):
        """Runs the flow; adds prior log-probs. Returns final z and objective."""
        rngs = (jax.random.split(rng, 2 * self.cfg.L)
                if rng is not None else [None] * (2 * self.cfg.L))
        for i in range(self.cfg.L):
            z, logdet = self.squeeze.forward({}, z, logdet)
            z, logdet = self._run_level_steps(i, params["levels"][i]["steps"],
                                              z, logdet, rng=rngs[2 * i],
                                              train=train)
            if i < self.cfg.L - 1:
                z1, z2 = split_channels(z)
                if self.prior is not None:
                    logdet = logdet + self.prior.log_likelihood(
                        params["prior"], (z1, z2), i + 1, rng=rngs[2 * i + 1],
                        train=train)
                    z = z1
                else:
                    z, logdet = self.split_priors[i].forward(
                        params["splits"][i], z, logdet)
        if self.prior is not None:
            logdet = logdet + self.prior.log_likelihood(
                params["prior"], z, self.cfg.L, rng=rngs[-1], train=train)
        else:
            logdet = logdet + GaussianDiag.logp(None, None, z)
        return z, logdet

    def forward(self, params, x, *, rng, train=False):
        """x in [-0.5, 0.5]. Returns (z, nll_bits_per_dim)."""
        rng_deq, rng_flow = jax.random.split(rng)
        z = x + jax.random.uniform(rng_deq, x.shape, x.dtype) * (1.0 / 256.0)
        logdet = jnp.full((x.shape[0],), -math.log(256.0) * self.num_dims,
                          dtype=jnp.float32)
        z, objective = self.encode(params, z, logdet, rng=rng_flow, train=train)
        nll = -objective / (math.log(2.0) * self.num_dims)
        return z, nll

    # -- sampling ------------------------------------------------------------
    def sample(self, params, rng, batch: int, eps_std: float = 1.0):
        cfg = self.cfg
        n_rngs = 1 + cfg.L + cfg.L * cfg.K
        rngs = list(jax.random.split(rng, n_rngs))
        it = iter(rngs)

        c, h, w = self.final_shape
        if self.prior is not None:
            z = self.prior.sample(params["prior"], next(it), cfg.L, batch=batch,
                                  eps_std=eps_std)
        else:
            z = GaussianDiag.sample_eps(next(it), (batch, c, h, w), eps_std)

        for i in reversed(range(cfg.L)):
            if i < cfg.L - 1:
                if self.prior is not None:
                    z2 = self.prior.sample(params["prior"], next(it), i + 1, z1=z,
                                           eps_std=eps_std)
                    z = jnp.concatenate([z, z2], axis=1)
                else:
                    z, _ = self.split_priors[i].inverse(
                        params["splits"][i], z, jnp.zeros((batch,)),
                        rng=next(it), eps_std=eps_std)
            z, _ = self._run_level_steps(i, params["levels"][i]["steps"], z,
                                         jnp.zeros((batch,)), rng=None,
                                         train=False, inverse=True)
            z, _ = self.squeeze.inverse({}, z, jnp.zeros((batch,)))
        return z

    # -- data-dependent init ---------------------------------------------------
    def ddi(self, params, x, rng):
        """Initialize all actnorms from a prototype batch (run eagerly, once)."""
        z = x + jax.random.uniform(rng, x.shape, x.dtype) * (1.0 / 256.0)
        logdet = jnp.zeros((x.shape[0],), jnp.float32)
        params = jax.tree.map(lambda a: a, params)  # rebuild containers
        for i, steps in enumerate(self.levels):
            z, logdet = self.squeeze.forward({}, z, logdet)
            stacked = self.cfg.scan_steps
            plist = (unstack_params(params["levels"][i]["steps"], len(steps))
                     if stacked else params["levels"][i]["steps"])
            new_list = []
            for j, step in enumerate(steps):
                new_p, z, logdet = step.ddi(plist[j], z, logdet)
                new_list.append(new_p)
            params["levels"][i]["steps"] = (stack_params(new_list) if stacked
                                            else new_list)
            if i < self.cfg.L - 1:
                z, _ = split_channels(z)
        return params
