"""Trained-feature perceptual distance — the `lpips_proxy` metric.

Reference Measure.py:31-53 scores SR images with AlexNet-LPIPS. This image
has no lpips wheel and zero egress for pretrained weights (BASELINE.md), so
two substitutes exist:
  - `utils/metrics.lpips_rf`: random-feature embedder (no training at all);
  - THIS module: a small VGG-ish conv encoder TRAINED in-env by
    self-supervised rotation prediction on the deterministic synthetic image
    set, with the trained weights checked into the repo
    (`weights/perceptual_v1.npz`) so the metric is bit-deterministic across
    machines. Distance follows the LPIPS recipe — channel-unit-normalized
    stage features, spatially averaged squared differences, summed over
    stages (uniform stage weights; real LPIPS learns them).

This is a PROXY: values are not comparable to published AlexNet-LPIPS
numbers. Train/update weights with scripts/train_perceptual.py.
"""
from __future__ import annotations

import os

import numpy as np

WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "weights",
                            "perceptual_v1.npz")
STAGE_WIDTHS = (16, 32, 64)


def _conv(x, w, b, stride=1):
    import jax
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW")) + b.reshape(1, -1, 1, 1)


def init_encoder(key):
    import jax
    import jax.numpy as jnp

    params = []
    c_in = 3
    for c_out in STAGE_WIDTHS:
        key, k1, k2 = jax.random.split(key, 3)
        s1 = float(np.sqrt(2.0 / (c_in * 9)))
        s2 = float(np.sqrt(2.0 / (c_out * 9)))
        params.append({
            "w1": s1 * jax.random.normal(k1, (c_out, c_in, 3, 3)),
            "b1": jnp.zeros((c_out,)),
            "w2": s2 * jax.random.normal(k2, (c_out, c_out, 3, 3)),
            "b2": jnp.zeros((c_out,)),
        })
        c_in = c_out
    return params


def encoder_stages(params, x):
    """x (B, 3, H, W) in [0, 1] -> list of per-stage feature maps."""
    import jax
    import jax.numpy as jnp

    x = x * 2.0 - 1.0
    feats = []
    for p in params:
        x = jax.nn.relu(_conv(x, p["w1"], p["b1"]))
        x = jax.nn.relu(_conv(x, p["w2"], p["b2"]))
        feats.append(x)
        b, c, h, w = x.shape
        x = x.reshape(b, c, h // 2, 2, w // 2, 2).mean((3, 5))  # avgpool2
    return feats


def _load_params():
    import jax.numpy as jnp

    cached = getattr(_load_params, "_cache", None)
    if cached is not None:
        return cached
    with np.load(WEIGHTS_PATH) as d:
        n = len(STAGE_WIDTHS)
        params = [{k: jnp.asarray(d[f"{i}/{k}"])
                   for k in ("w1", "b1", "w2", "b2")} for i in range(n)]
    _load_params._cache = params
    return params


def save_params(params, path=WEIGHTS_PATH):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    flat = {f"{i}/{k}": np.asarray(v) for i, p in enumerate(params)
            for k, v in p.items()}
    np.savez(path, **flat)


def lpips_proxy(a: np.ndarray, b: np.ndarray) -> float:
    """Perceptual distance between two HWC (or HW) uint8/[0,1] images using
    the checked-in trained encoder. Deterministic; 0 for identical inputs."""
    import jax
    import jax.numpy as jnp

    params = _load_params()

    def prep(x):
        x = np.asarray(x, np.float32)
        if x.ndim == 2:
            x = x[..., None]
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        if x.max() > 1.5:
            x = x / 255.0
        return jnp.asarray(np.transpose(x, (2, 0, 1))[None])

    fn = getattr(lpips_proxy, "_fn", None)
    if fn is None:
        @jax.jit
        def fn(params, xa, xb):
            fa = encoder_stages(params, xa)
            fb = encoder_stages(params, xb)
            total = 0.0
            for ya, yb in zip(fa, fb):
                na = ya / jnp.sqrt(jnp.sum(ya**2, 1, keepdims=True) + 1e-10)
                nb = yb / jnp.sqrt(jnp.sum(yb**2, 1, keepdims=True) + 1e-10)
                total = total + jnp.mean(jnp.sum((na - nb) ** 2, axis=1))
            return total
        lpips_proxy._fn = fn
    return float(fn(params, prep(a), prep(b)))


def train_encoder(steps: int = 600, batch: int = 64, lr: float = 2e-3,
                  seed: int = 0, log_fn=print):
    """Self-supervised rotation-prediction training on the synthetic set.

    Returns (params, final_accuracy). Deterministic given the seed.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..data.datasets import _synthetic

    train_u8, _ = _synthetic(32)  # (N, 3, 32, 32) uint8
    images = np.asarray(train_u8, np.float32) / 255.0

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = init_encoder(k_init)
    # linear rotation head on globally pooled last-stage features.
    # 2-way (0/90 deg): the synthetic patterns are 180deg-symmetric, so
    # 4-way rotation has two indistinguishable class pairs
    key, k_head = jax.random.split(key)
    head = {"w": 0.01 * jax.random.normal(k_head, (STAGE_WIDTHS[-1], 2)),
            "b": jnp.zeros((2,))}

    opt = optax.adam(lr)
    state = opt.init((params, head))

    def loss_fn(ph, x, labels):
        params, head = ph
        feats = encoder_stages(params, x)
        pooled = jnp.mean(feats[-1], axis=(2, 3))
        logits = pooled @ head["w"] + head["b"]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return jnp.mean(ce), acc

    @jax.jit
    def step(ph, state, x, labels):
        (l, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(ph, x, labels)
        upd, state = opt.update(g, state, ph)
        return optax.apply_updates(ph, upd), state, l, acc

    rng = np.random.default_rng(seed)
    ph = (params, head)
    acc = 0.0
    for it in range(steps):
        idx = rng.integers(0, len(images), batch)
        x = images[idx]
        labels = rng.integers(0, 2, batch)
        x = np.stack([np.rot90(img, k, axes=(1, 2)).copy()
                      for img, k in zip(x, labels)])
        ph, state, l, acc = step(ph, state, jnp.asarray(x),
                                 jnp.asarray(labels))
        if it % 100 == 0:
            log_fn(f"perceptual step {it}: ce={float(l):.3f} "
                   f"acc={float(acc):.3f}")
    return ph[0], float(acc)
