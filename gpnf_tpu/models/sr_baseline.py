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
