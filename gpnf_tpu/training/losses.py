"""Losses for the SR baselines.

Reference: loss.py == models/modules/loss.py (CharbonnierLoss 21-32,
GANLoss 35-67, GradientPenaltyLoss 70-90).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def charbonnier_loss(pred, target, eps: float = 1e-6):
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


PIXEL_LOSSES = {"l1": l1_loss, "l2": l2_loss, "cb": charbonnier_loss}


def gan_loss(kind: str, logits, target_is_real: bool):
    """'gan' (BCE-with-logits), 'lsgan' (MSE), 'wgan-gp' (mean sign)."""
    if kind == "wgan-gp":
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    target = jnp.full_like(logits, 1.0 if target_is_real else 0.0)
    if kind == "gan":
        return jnp.mean(jnp.maximum(logits, 0) - logits * target
                        + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    if kind == "lsgan":
        return jnp.mean((logits - target) ** 2)
    raise ValueError(kind)


def gradient_penalty(disc_fn, rng, real, fake):
    """WGAN-GP penalty on random interpolates (loss.py:70-90)."""
    alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake

    def d_sum(x):
        return jnp.sum(disc_fn(x))

    grads = jax.grad(d_sum)(interp)
    norm = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, -1) + 1e-12)
    return jnp.mean((norm - 1.0) ** 2)
