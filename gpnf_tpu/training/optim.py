"""Optimizer pytree-layout transforms (TPU kernel-launch economics).

Per-leaf elementwise optimizer updates emit one fused kernel per param
leaf at a ~6 us launch floor; the flagship mAR-SCF model has 584 leaves of
which 423 hold <=4096 elements — 0.5% of the 46M params (docs/BENCHMARKS.md
round-3 step anatomy). Two prior attempts bracketed the fix:

- per-leaf everywhere: ~1k tiny launch-floor kernels per step;
- ``optax.flatten`` over the FULL tree: no tiny kernels, but raveling all
  params + grads + two moments every step is ~0.5 GB of pure HBM
  concat/slice traffic and it breaks buffer donation — measured 23%
  SLOWER end-to-end (532 vs 696 img/s, flat-opt A/B).

``flatten_small`` is the middle point: ravel ONLY the tiny leaves (per
dtype) into one flat vector — a few MB of traffic — and keep the large
leaves per-leaf, donation-friendly. Coordinate-wise transforms (Adam,
Adamax, weight decay, clipping, ...) are invariant under this relayout,
same as ``optax.flatten``'s premise.

No reference counterpart: torch optimizers iterate per-tensor on the host
(marscf_main.py:304, torch.optim.Adamax) where launch count is hidden by
CUDA stream queuing; on TPU the per-step dispatch economics are ours to
manage.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class _RefAdamaxState(NamedTuple):
    count: jnp.ndarray  # int32 step counter (completed updates)
    mu: Any             # first-moment EMA (torch exp_avg)
    nu: Any             # infinity-norm buffer (torch exp_inf)


def reference_adamax(learning_rate,
                     b1: float = 0.9,
                     b2: float = 0.999,
                     eps: float = 1e-8) -> optax.GradientTransformation:
    """Adamax with torch.optim.Adamax's EXACT update semantics.

    The reference trains with ``optim.Adamax(lr=1e-4)`` (marscf_main.py:302).
    ``optax.adamax`` differs from torch in one place: torch folds eps into the
    infinity-norm buffer, ``u_t = max(b2*u, |g| + eps)`` then divides by
    ``u_t``; optax keeps ``u_t = max(b2*u, |g|)`` and divides by ``u_t + eps``.
    For trajectory parity (bits/dim at 400 epochs, BASELINE.md) we replicate
    torch exactly: u is monotone >= eps from step 1 under torch's form, which
    changes tiny-gradient coordinates' effective step size.

    ``learning_rate`` may be a float or a schedule evaluated at the number of
    COMPLETED updates (0 for the first), matching optax convention.
    """
    def init_fn(params):
        z = lambda p: jnp.zeros_like(p)
        return _RefAdamaxState(count=jnp.zeros([], jnp.int32),
                               mu=jax.tree.map(z, params),
                               nu=jax.tree.map(z, params))

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda u, g: jnp.maximum(b2 * u, jnp.abs(g) + eps),
                          state.nu, updates)
        count = state.count + 1
        if callable(learning_rate):
            lr = learning_rate(state.count)
        else:
            lr = learning_rate
        # torch: param -= (lr / (1 - b1^t)) * exp_avg / exp_inf
        clr = lr / (1.0 - b1 ** count.astype(jnp.float32))
        new_updates = jax.tree.map(lambda m, u: (-clr) * m / u, mu, nu)
        return new_updates, _RefAdamaxState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def reference_warmup(base_lr: float, warm_up: int, batch_size: int):
    """The reference's linear-warmup schedule with its EXACT step counting.

    marscf_main.py:303,345-347: ``LambdaLR(opt, lambda s: min(1, s/warm_up))``
    driven by ``scheduler.step(global_step)`` AFTER ``optimizer.step()``, with
    ``global_step`` counted in SAMPLES and incremented after the scheduler
    call. Net effect: update i (0-based) runs at
    ``base_lr * min(1, (i-1)*batch_size / warm_up)`` — updates 0 and 1 run at
    lr 0 (LambdaLR's constructor already applies lambda(0)), i.e. the whole
    ramp lags one step behind a naive ``min(1, i*bs/warm_up)``.
    """
    wu = float(max(warm_up, 1))

    def schedule(count):
        s = jnp.maximum(count.astype(jnp.float32) - 1.0, 0.0) * batch_size
        return base_lr * jnp.minimum(1.0, s / wu)

    return schedule


def flatten_small(inner: optax.GradientTransformation,
                  params: Any,
                  threshold: int = 4096) -> optax.GradientTransformation:
    """Wrap ``inner`` so leaves with ``size <= threshold`` update as one
    raveled vector per dtype while larger leaves stay per-leaf.

    ``params`` fixes the partition (structure, shapes, dtypes) at wrap
    time; the returned transform only accepts trees of that structure.
    The optimizer STATE pytree differs from ``inner``'s (checkpoints of
    one layout restore params but fall back to a fresh optimizer under
    the other — same caveat as ``optax.flatten``).
    """
    leaves, treedef = jax.tree.flatten(params)
    n = len(leaves)
    small_idx = [i for i, l in enumerate(leaves) if l.size <= threshold]
    large_idx = [i for i, l in enumerate(leaves) if l.size > threshold]
    meta = {i: (leaves[i].shape, jnp.dtype(leaves[i].dtype),
                int(np.prod(leaves[i].shape, dtype=np.int64)))
            for i in small_idx}
    # one flat bucket per dtype (concat requires a single dtype)
    buckets: dict[str, list[int]] = {}
    for i in small_idx:
        buckets.setdefault(str(meta[i][1]), []).append(i)
    bucket_keys = sorted(buckets)

    def split(tree):
        lvs = treedef.flatten_up_to(tree)
        if len(lvs) != n:
            raise ValueError("flatten_small: tree structure mismatch")
        flat = {k: jnp.concatenate([jnp.ravel(lvs[i]) for i in buckets[k]])
                for k in bucket_keys}
        return {"flat": flat, "large": tuple(lvs[i] for i in large_idx)}

    def merge(s):
        out: list[Any] = [None] * n
        for k in bucket_keys:
            vec, off = s["flat"][k], 0
            for i in buckets[k]:
                shape, _, size = meta[i]
                out[i] = jax.lax.slice(vec, (off,), (off + size,)).reshape(shape)
                off += size
        for j, i in enumerate(large_idx):
            out[i] = s["large"][j]
        return treedef.unflatten(out)

    def init_fn(p):
        return inner.init(split(p))

    def update_fn(updates, state, p=None):
        new_u, new_state = inner.update(
            split(updates), state, split(p) if p is not None else None)
        return merge(new_u), new_state

    return optax.GradientTransformation(init_fn, update_fn)
