"""Plain (non-flow) SR baseline: RRDB generator + pixel loss.

Reference: models/SR_model.py (SRModel 32-217) — L1/L2/Charbonnier pixel
loss on the RRDB output, MultiStep/cosine LR. The TPU version is a thin
functional trainer over RRDBNet's `out` head.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from ..training.losses import PIXEL_LOSSES
from .rrdb import RRDBConfig, RRDBNet
from . import register_model


@dataclass
class SRBaselineTrainConfig:
    pixel_criterion: str = "l1"  # l1 | l2 | cb
    pixel_weight: float = 1.0
    lr: float = 2e-4
    lr_steps: Sequence[int] = (200000, 400000)
    lr_gamma: float = 0.5
    niter: int = 600000


@register_model("sr")
class SRBaseline:
    def __init__(self, rrdb_cfg: RRDBConfig):
        self.net = RRDBNet(rrdb_cfg)

    def init(self, key):
        return self.net.init(key)

    def forward(self, params, lr_img):
        return self.net.apply(params, lr_img, get_steps=False)

    def make_train_step(self, cfg: SRBaselineTrainConfig):
        loss_name = cfg.pixel_criterion
        pix_loss = PIXEL_LOSSES[loss_name]

        def sched(step):
            lr = cfg.lr
            for m in cfg.lr_steps:
                lr = jnp.where(step >= m, lr * cfg.lr_gamma, lr)
            return lr

        opt = optax.adam(learning_rate=sched)

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, lr_img, hr_img):
            def loss_fn(p):
                sr = self.net.apply(p, lr_img, get_steps=False)
                return cfg.pixel_weight * pix_loss(sr, hr_img)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return opt, step


def train_sr_baseline(rrdb_cfg: RRDBConfig, cfg: SRBaselineTrainConfig,
                      train_set, val_set=None, *, batch_size: int = 16,
                      max_steps=None, checkpoint_dir: str =
                      "./experiments/sr/models", val_freq: int = 5000,
                      seed: int = 0, log_fn=print):
    """Plain-SR training loop (models/SR_model.py:32-217 / train.py driven by
    `model: SR` in the YAML): pixel loss on RRDBNet output, periodic val
    PSNR, best-PSNR checkpointing. Shares the LRHR dataset batching with the
    SRFlow loop."""
    from ..training.checkpoints import CheckpointManager
    from ..utils.jax_setup import init_on_cpu
    from ..utils.metrics import psnr
    import numpy as np

    model = SRBaseline(rrdb_cfg)
    params = init_on_cpu(model.init, jax.random.PRNGKey(seed))
    opt, step_fn = model.make_train_step(cfg)
    opt_state = jax.jit(opt.init)(params)
    ckpt = CheckpointManager(checkpoint_dir)

    fwd = jax.jit(model.forward)

    def val_psnr(p):
        vals = []
        vb = 4
        for lr_img, hr_img in val_set.batches(vb, shuffle=False,
                                              drop_last=False):
            n_real = len(lr_img)
            if n_real < vb:  # pad to the compiled batch shape (one program)
                lr_img = np.concatenate(
                    [lr_img] + [lr_img[:1]] * (vb - n_real), axis=0)
            sr = np.asarray(fwd(p, jnp.asarray(lr_img)))[:n_real]
            for j in range(n_real):
                vals.append(psnr(
                    np.clip(sr[j].transpose(1, 2, 0), 0, 1) * 255,
                    np.asarray(hr_img[j]).transpose(1, 2, 0) * 255))
        return float(np.mean(vals)) if vals else float("nan")

    if len(train_set) < batch_size:
        raise ValueError(
            f"train set has {len(train_set)} images < batch_size "
            f"{batch_size}: batches() with drop_last yields nothing and the "
            "loop would spin forever")
    it, total = 0, (max_steps or cfg.niter)
    last_saved = -1
    while it < total:
        for lr_img, hr_img in train_set.batches(batch_size):
            params, opt_state, loss = step_fn(params, opt_state,
                                              jnp.asarray(lr_img),
                                              jnp.asarray(hr_img))
            it += 1
            if it % 100 == 0:
                log_fn(f"iter {it} pix_loss {float(loss):.5f}")
            if val_set is not None and it % val_freq == 0:
                v = val_psnr(params)
                log_fn(f"iter {it} val PSNR {v:.2f}")
                ckpt.save(it, {"params": params, "opt_state": opt_state},
                          metric=-v)
                last_saved = it
            if it >= total:
                break
    if last_saved != it:
        ckpt.save(it, {"params": params, "opt_state": opt_state})
    return model, params
