"""SRFlow training/eval driver.

Reference behaviors replicated TPU-natively (models/SRFlow_model.py,
train.py, models/SR_model.py):
  - two Adam parameter groups (RRDB vs flow) with separate LRs
    (SRFlow_model.py:72-119), realized with optax.multi_transform;
  - delayed RRDB training: RRDB grads are zeroed until
    step > train_RRDB_delay * niter (SRFlow_model.py:136-142), a mask
    change, not a Python-level optimizer rebuild;
  - nll loss (+ optional reverse-L1 weight, SRFlow_model.py:150-167);
  - per-heat validation sampling + PSNR (train.py:227-303);
  - MultiStep/cosine LR with warmup (base_model.py:69-81, lr_scheduler.py).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.srflow import SRFlowConfig, SRFlowNet
from ..utils.metrics import psnr
from .checkpoints import CheckpointManager


@dataclass
class SRTrainConfig:
    niter: int = 200000
    lr_G: float = 2.5e-4
    lr_RRDB: float = 2.5e-4
    lr_steps: Sequence[int] = (100000, 150000, 180000, 190000)
    lr_gamma: float = 0.5
    warmup_iter: int = -1
    weight_decay: float = 0.0
    train_rrdb_delay: float = 0.5
    weight_l1: float = 0.0  # reverse-L1 auxiliary loss weight
    heats: Sequence[float] = (0.0, 0.5, 0.75, 1.0)
    batch_size: int = 16
    seed: int = 0


def _lr_schedule(cfg: SRTrainConfig, base_lr: float):
    """Reference-exact MultiStep decay + warmup counting.

    The reference steps the scheduler BEFORE each update with current_step
    starting at 1 (train.py:184-192, base_model.py:69-81): update i
    (1-based) runs at base * gamma^|{milestones <= i}|, overridden by
    init * i / warmup while i < warmup_iter. optax evaluates schedules at
    the COMPLETED-update count t = i - 1, hence the +1 below (pinned by
    tests/test_optim.py::test_srflow_adam_schedule_lockstep_vs_torch).

    Reference quirk kept for parity: the warmup override MUTATES the
    param group's lr, and MultiStepLR_Restart's get_lr returns that
    mutated value on non-milestone steps — so after warmup the base lr
    stays at init*(warmup-1)/warmup forever, and milestones passed
    DURING warmup leave no lasting effect.
    """
    def sched(step):
        i = step + 1  # reference current_step (1-based)
        if cfg.warmup_iter > 1:
            post = base_lr * (cfg.warmup_iter - 1) / cfg.warmup_iter
        else:
            # warmup_iter <= 1: the reference override (`if cur_iter <
            # warmup_iter`) never fires, so group lr is never mutated
            post = base_lr
        lr = post
        for m in cfg.lr_steps:
            if cfg.warmup_iter > 0 and m < cfg.warmup_iter:
                continue  # decay overwritten by the warmup override
            lr = jnp.where(i >= m, lr * cfg.lr_gamma, lr)
        if cfg.warmup_iter > 0:
            lr = jnp.where(i < cfg.warmup_iter,
                           base_lr * i / cfg.warmup_iter, lr)
        return lr
    return sched


def make_srflow_optimizer(cfg: SRTrainConfig, params):
    """Two param groups: 'rrdb' vs 'flow', with an RRDB-delay gradient mask."""
    def label_fn(p):
        return {"rrdb": jax.tree.map(lambda _: "rrdb", p["rrdb"]),
                "flow": jax.tree.map(lambda _: "flow", p["flow"])}

    flat_mode = os.environ.get("GPNF_FLAT_OPT", "0")

    def group(base_lr, sub_params=None):
        # Optimizer pytree layout (docs/BENCHMARKS.md flat-opt A/B):
        # per-leaf by default; GPNF_FLAT_OPT=1 = optax.flatten (full ravel,
        # 23% slower on the mAR-SCF loop); GPNF_FLAT_OPT=small = ravel only
        # tiny leaves (training/optim.py flatten_small).
        g = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay
            else optax.identity(),
            optax.adam(learning_rate=_lr_schedule(cfg, base_lr), b1=0.9, b2=0.99),
        )
        if flat_mode == "1":
            g = optax.flatten(g)
        elif flat_mode == "small" and sub_params is not None:
            from .optim import flatten_small
            g = flatten_small(g, sub_params)
        return g

    if flat_mode == "small":
        # multi_transform's masked trees (MaskedNode leaves) are structurally
        # incompatible with flatten_small's fixed partition, but the two
        # labels split exactly at the top-level key — partition directly.
        g_rrdb = group(cfg.lr_RRDB, params["rrdb"])
        g_flow = group(cfg.lr_G, params["flow"])

        def _init(p):
            return {"rrdb": g_rrdb.init(p["rrdb"]), "flow": g_flow.init(p["flow"])}

        def _update(u, s, p=None):
            ur, sr = g_rrdb.update(u["rrdb"], s["rrdb"],
                                   p["rrdb"] if p is not None else None)
            uf, sf = g_flow.update(u["flow"], s["flow"],
                                   p["flow"] if p is not None else None)
            return {"rrdb": ur, "flow": uf}, {"rrdb": sr, "flow": sf}

        opt = optax.GradientTransformation(_init, _update)
    else:
        opt = optax.multi_transform(
            {"rrdb": group(cfg.lr_RRDB), "flow": group(cfg.lr_G)}, label_fn)
    # skip non-finite updates (train.py:194-198 catch-and-continue analogue)
    opt = optax.apply_if_finite(opt, max_consecutive_errors=100)

    delay_steps = int(cfg.train_rrdb_delay * cfg.niter)

    def mask_rrdb(grads, step):
        """Zero RRDB grads until the delay elapses (steady-state jit-safe)."""
        factor = (step >= delay_steps).astype(jnp.float32)
        return {"rrdb": jax.tree.map(lambda g: g * factor, grads["rrdb"]),
                "flow": grads["flow"]}

    return opt, mask_rrdb


def make_srflow_train_step(model: SRFlowNet, cfg: SRTrainConfig, opt, mask_rrdb):
    def loss_fn(params, lr_img, hr_img, rng):
        _, nll, _ = model.forward(params, hr_img, lr_img, rng=rng, train=True)
        loss = jnp.mean(nll)
        if cfg.weight_l1 > 0:
            sr, _ = model.reverse(params, lr_img, rng=rng, eps_std=0.8)
            loss = loss + cfg.weight_l1 * jnp.mean(jnp.abs(sr - hr_img))
        return loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, lr_img, hr_img, rng, it):
        loss, grads = jax.value_and_grad(loss_fn)(params, lr_img, hr_img, rng)
        grads = mask_rrdb(grads, it)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sr_sampler(model: SRFlowNet):
    """eps_std is a TRACED scalar: one compile serves every heat (the
    reference walks 4 heats per validation; static_argnames here cost 4
    multi-minute compiles on the 1-core host)."""
    @jax.jit
    def sample(params, lr_img, rng, eps_std):
        sr, _ = model.reverse(params, lr_img, rng=rng,
                              eps_std=jnp.asarray(eps_std, jnp.float32))
        return sr
    return sample


def validate(model: SRFlowNet, params, dataset, *, heats=(0.75,), rng=None,
             max_items: Optional[int] = None, batch: int = 8):
    """Mean PSNR per heat over the (whole, by default) val set, STREAMED in
    batches straight from the dataset (train.py:227-303 walks the full val
    set; materializing it as unbatched host pairs first was a round-2 weak
    spot — wrong shape for a real DF2K directory). The sampler takes heat as
    a traced scalar, so all heats share one compile; the final short batch is
    padded to the jit'd batch size to avoid a recompile."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    sampler = make_sr_sampler(model)
    out = {}
    for heat in heats:
        vals = []
        seen = 0
        for lr_img, hr_img in dataset.batches(batch, shuffle=False,
                                              drop_last=False):
            if max_items is not None:
                lr_img = lr_img[: max_items - seen]
                hr_img = hr_img[: max_items - seen]
                if len(lr_img) == 0:
                    break
            n_real = len(lr_img)
            if n_real < batch:  # pad to the compiled batch shape
                reps = [lr_img] + [lr_img[:1]] * (batch - n_real)
                lr_img = np.concatenate(reps, axis=0)
            rng, sub = jax.random.split(rng)
            sr_b = np.asarray(sampler(params, jnp.asarray(lr_img), sub,
                                      float(heat)))[:n_real]
            for j in range(n_real):
                sr_img = np.clip(sr_b[j].transpose(1, 2, 0), 0, 1) * 255
                vals.append(psnr(sr_img,
                                 np.asarray(hr_img[j]).transpose(1, 2, 0)
                                 * 255))
            seen += n_real
        out[heat] = float(np.mean(vals)) if vals else float("nan")
    return out


def train_srflow(model_cfg: SRFlowConfig, train_cfg: SRTrainConfig, train_set,
                 val_set=None, *, max_steps: Optional[int] = None,
                 checkpoint_dir: str = "./experiments/srflow/models",
                 val_freq: int = 5000, resume: bool = True, log_fn=print):
    from ..utils.jax_setup import init_on_cpu

    model = SRFlowNet(model_cfg)
    rng = jax.random.PRNGKey(train_cfg.seed)
    rng, k_init, k_ddi = jax.random.split(rng, 3)
    params = init_on_cpu(model.init, k_init)

    lr0, hr0 = next(iter(train_set.batches(min(train_cfg.batch_size, 4))))
    params = jax.jit(model.ddi)(params, jnp.asarray(hr0), jnp.asarray(lr0), k_ddi)

    opt, mask_rrdb = make_srflow_optimizer(train_cfg, params)
    opt_state = jax.jit(opt.init)(params)
    step_fn = make_srflow_train_step(model, train_cfg, opt, mask_rrdb)
    ckpt = CheckpointManager(checkpoint_dir)

    it = 0
    # auto-resume from the newest training state (reference `resume_state:
    # auto`, utils/util.py:150-162 + base_model.py:145-154)
    if resume and ckpt.latest_step() is not None:
        it = ckpt.latest_step()
        try:
            try:
                state = ckpt.restore({"params": params, "opt_state": opt_state})
                params, opt_state = state["params"], state["opt_state"]
            except KeyError:  # older params-only checkpoint: fresh optimizer
                params = ckpt.restore({"params": params})["params"]
            log_fn(f"auto-resumed from step {it}")
        except ValueError as e:  # shape mismatch: stale architecture
            log_fn(f"WARNING: ignoring incompatible checkpoint ({e}); "
                   "training from scratch")
            it = 0
    if len(train_set) < train_cfg.batch_size:
        raise ValueError(
            f"train set has {len(train_set)} images < batch_size "
            f"{train_cfg.batch_size}: batches() with drop_last yields "
            "nothing and the loop would spin forever")
    total = max_steps or train_cfg.niter

    class _Epoch:
        """Re-iterable adapter so PrefetchLoader can restart each epoch."""

        def __iter__(self):
            return train_set.batches(train_cfg.batch_size)

        def __len__(self):
            return len(train_set) // train_cfg.batch_size

    from ..data.datasets import PrefetchLoader
    loader = PrefetchLoader(_Epoch(), depth=2, to_device=True)
    import time as _time
    td = 0.0  # host data-wait per log window (reference `td:` field,
    #           utils/timer.py:54-78 TickTock)
    while it < total:
        t_mark = _time.time()
        for lr_img, hr_img in loader:
            td += _time.time() - t_mark
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step_fn(params, opt_state,
                                              jnp.asarray(lr_img),
                                              jnp.asarray(hr_img), sub,
                                              jnp.asarray(it))
            it += 1
            if it % 100 == 0:
                log_fn(f"iter {it} nll {float(loss):.4f} "
                       f"td {td * 10:.1f}ms")  # avg ms/step over the window
                td = 0.0
                if getattr(train_set, "measures", None):
                    train_set.print_and_reset("train_data", log_fn=log_fn)
            if val_set is not None and it % val_freq == 0:
                psnrs = validate(model, params, val_set, heats=train_cfg.heats, rng=rng)
                log_fn(f"iter {it} val PSNR: " +
                       " ".join(f"h{h}={v:.2f}" for h, v in psnrs.items()))
                ckpt.save(it, {"params": params, "opt_state": opt_state},
                          metric=-max(v for v in psnrs.values()))
            if it >= total:
                break
            t_mark = _time.time()
    ckpt.save(it, {"params": params, "opt_state": opt_state})
    return model, params
