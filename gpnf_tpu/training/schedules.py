"""Learning-rate schedules.

Reference: marscf_main.py:303 (linear warmup LambdaLR over samples seen) and
models/lr_scheduler.py (MultiStepLR_Restart 24-50, CosineAnnealingLR_Restart
53-81). Implemented as optax-compatible `schedule(step) -> multiplier` fns.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def linear_warmup(warm_up: int):
    """min(1, s / warm_up); the reference counts s in *samples*, callers decide."""
    def schedule(step):
        return jnp.minimum(1.0, step / warm_up)
    return schedule


def multistep_restart(milestones: Sequence[int], gamma: float = 0.1,
                      restarts: Sequence[int] = (), restart_weights: Sequence[float] = ()):
    """MultiStep decay with optional restarts that reset the multiplier.

    Matches models/lr_scheduler.py:24-50: at a restart step the multiplier
    becomes the restart weight; otherwise gamma**(#milestones passed since
    the last restart... the reference counts all milestones; we keep that).
    """
    milestones = sorted(milestones)
    restarts = list(restarts)
    restart_weights = list(restart_weights) or [1.0] * len(restarts)
    assert len(restarts) == len(restart_weights)

    def schedule(step):
        mult = 1.0
        for r, w in zip(restarts, restart_weights):
            mult = jnp.where(step >= r, w, mult)
        decays = sum(jnp.where(step >= m, 1, 0) for m in milestones)
        return mult * gamma ** decays

    return schedule


def cosine_restart(t_period: Sequence[int], eta_min_ratio: float = 0.0,
                   restart_weights: Sequence[float] = None):
    """Cosine annealing with warm restarts (models/lr_scheduler.py:53-81).

    `t_period` are the lengths of successive cosine segments; at each restart
    the multiplier restarts at the corresponding weight.
    """
    t_period = list(t_period)
    restart_weights = list(restart_weights or [1.0] * len(t_period))
    starts = [0]
    for p in t_period[:-1]:
        starts.append(starts[-1] + p)

    def schedule(step):
        mult = 0.0
        for start, period, w in zip(starts, t_period, restart_weights):
            inside = jnp.logical_and(step >= start, step < start + period)
            local = (step - start) / period
            seg = eta_min_ratio + (w - eta_min_ratio) * 0.5 * (1 + jnp.cos(math.pi * local))
            mult = jnp.where(inside, seg, mult)
        # past the last period: hold the final value
        last_end = starts[-1] + t_period[-1]
        final = eta_min_ratio
        return jnp.where(step >= last_end, final, mult)

    return schedule
