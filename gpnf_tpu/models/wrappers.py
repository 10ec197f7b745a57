"""BaseModel-style imperative wrappers over the functional cores.

Reference API surface: models/base_model.py:26-53 (feed_data /
optimize_parameters / test / get_current_visuals / save / load, LR warmup,
save/resume training state) and models/SRFlow_model.py. Users porting from
the reference get the same call shape; internally everything routes to the
jitted functional train/eval steps.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..training.checkpoints import CheckpointManager
from ..training.srflow_loop import (SRTrainConfig, make_sr_sampler,
                                    make_srflow_optimizer,
                                    make_srflow_train_step)
from ..utils.jax_setup import init_on_cpu, to_default_device
from .srflow import SRFlowConfig, SRFlowNet


class SRFlowModel:
    """Imperative facade matching the reference SRFlowModel usage."""

    def __init__(self, model_cfg: SRFlowConfig, train_cfg: SRTrainConfig,
                 checkpoint_dir: str = "./experiments/srflow/models", seed: int = 0):
        self.net = SRFlowNet(model_cfg)
        self.cfg = model_cfg
        self.train_cfg = train_cfg
        rng = jax.random.PRNGKey(seed)
        self.rng, k_init = jax.random.split(rng)
        self.params = to_default_device(init_on_cpu(self.net.init, k_init))
        self.opt, self._mask = make_srflow_optimizer(train_cfg, self.params)
        self.opt_state = jax.jit(self.opt.init)(self.params)
        self._step_fn = make_srflow_train_step(self.net, train_cfg, self.opt,
                                               self._mask)
        self._sampler = make_sr_sampler(self.net)
        self.ckpt = CheckpointManager(checkpoint_dir)
        self._data: Dict[str, jax.Array] = {}
        self._visuals: Dict[str, np.ndarray] = {}
        self._ddi_done = False
        self.step = 0

    # -- reference protocol ---------------------------------------------------
    def feed_data(self, data: Dict[str, np.ndarray]):
        """data: {'LQ': (B,C,h,w), 'GT': (B,C,H,W)} in [0,1]."""
        self._data = {k: jnp.asarray(v) for k, v in data.items()}

    def optimize_parameters(self, step: int) -> float:
        lq, gt = self._data["LQ"], self._data["GT"]
        if not self._ddi_done:
            self.rng, sub = jax.random.split(self.rng)
            self.params = jax.jit(self.net.ddi)(self.params, gt, lq, sub)
            self._ddi_done = True
        self.rng, sub = jax.random.split(self.rng)
        self.params, self.opt_state, loss = self._step_fn(
            self.params, self.opt_state, lq, gt, sub, jnp.asarray(step))
        self.step = step
        return float(loss)

    def test(self, heats=(0.75,), n_sample: int = 1):
        """Sample SR images per heat into current visuals."""
        lq = self._data["LQ"]
        out = {}
        for heat in heats:
            for i in range(n_sample):
                self.rng, sub = jax.random.split(self.rng)
                sr = self._sampler(self.params, lq, sub, float(heat))
                out[f"SR_h{heat:.2f}_{i}"] = np.asarray(sr)
        self._visuals = out
        return out

    def get_current_visuals(self):
        vis = dict(self._visuals)
        if "LQ" in self._data:
            vis["LQ"] = np.asarray(self._data["LQ"])
        if "GT" in self._data:
            vis["GT"] = np.asarray(self._data["GT"])
        return vis

    def save(self, label: Optional[int] = None, metric: Optional[float] = None):
        step = label if label is not None else self.step
        return self.ckpt.save(step, {"params": self.params,
                                     "opt_state": self.opt_state}, metric=metric)

    def load(self, step: Optional[int] = None, best: bool = False):
        state = self.ckpt.restore({"params": self.params,
                                   "opt_state": self.opt_state},
                                  step=step, best=best)
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self._ddi_done = True

    def resume_training(self):
        latest = self.ckpt.latest_step()
        if latest is not None:
            self.load(step=latest)
            self.step = latest
        return latest

    def get_sr(self, lq, heat: float = 0.75):
        self.rng, sub = jax.random.split(self.rng)
        return np.asarray(self._sampler(self.params, jnp.asarray(lq), sub,
                                        float(heat)))
