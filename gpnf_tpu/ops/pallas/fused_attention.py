"""Fused multi-head attention kernel for the Flow++ coupling networks.

The GatedAttn block (ops/mixlogcdf.py) materializes (B, H, S, S) weight
tensors plus a same-shaped dropout mask in HBM; at CIFAR level 1 that is
67M elements per block, ~10x per coupling — measured as the dominant cost
of the training step (docs/BENCHMARKS.md). S <= 256 here, so the whole
score matrix for one (batch, all-heads) slice fits VMEM: this kernel fuses
scores -> softmax -> dropout -> @V in one pass, with dropout bits generated
in-kernel (pltpu.prng_*) and regenerated identically in the backward kernel,
so no mask ever touches HBM.

Backward (custom_vjp): standard attention gradients with the dropout mask
re-derived from the same per-program seed:
    P = softmax(S);  Pd = drop(P)
    dV = Pd^T g;  dPd = g V^T;  dP = mask*dPd/(1-r)
    dS = P * (dP - rowsum(dP * P));  dQ = dS K;  dK = dS^T Q
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_S = 512  # VMEM budget guard: S*S*H fp32 scores per program


def _softmax_last(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dropout_keep(shape, rate):
    """uint32 threshold mask from the already-seeded in-kernel PRNG."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return bits >= threshold


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = q_ref[0]  # (H, S, Dh)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = _softmax_last(s)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropout_keep(p.shape, rate)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = _softmax_last(s)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropout_keep(p.shape, rate)
        pd = jnp.where(keep, p / (1.0 - rate), 0.0)
    else:
        pd = p
    # dV = Pd^T g : (H, S, S)^T x (H, S, Dh)
    dv = jax.lax.dot_general(pd, g, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    # dPd = g V^T
    dpd = jax.lax.dot_general(g, v.astype(jnp.float32),
                              (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    if rate > 0.0:
        dp = jnp.where(keep, dpd / (1.0 - rate), 0.0)
    else:
        dp = dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(ds, k.astype(jnp.float32),
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q.astype(jnp.float32),
                             (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(b, h, s, dh, n_out):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    t = pl.BlockSpec((1, h, s, dh), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    return seed, t


def _run_fwd(seed, q, k, v, rate):
    from jax.experimental import pallas as pl

    b, h, s, dh = q.shape
    seed_spec, t_spec = _specs(b, h, s, dh, 1)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate),
        grid=(b,),
        in_specs=[seed_spec, t_spec, t_spec, t_spec],
        out_specs=t_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(seed, q, k, v)


def _run_bwd(seed, q, k, v, g, rate):
    from jax.experimental import pallas as pl

    b, h, s, dh = q.shape
    seed_spec, t_spec = _specs(b, h, s, dh, 3)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate),
        grid=(b,),
        in_specs=[seed_spec, t_spec, t_spec, t_spec, t_spec],
        out_specs=[t_spec, t_spec, t_spec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
    )(seed, q, k, v, g)


def _reference(seed, q, k, v, rate, train):
    """jnp fallback and ground truth; the dropout stream differs from the
    kernel's (same distribution), so exact comparisons use rate=0."""
    weights = jnp.einsum("bhsd,bhtd->bhst", q, k,
                         preferred_element_type=jnp.float32)
    p = jax.nn.softmax(weights, axis=-1)
    if rate > 0.0 and train:
        mask_key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
        keep = jax.random.bernoulli(mask_key, 1.0 - rate, p.shape)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    out = jnp.einsum("bhst,bhtd->bhsd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(seed, q, k, v, rate: float = 0.0, train: bool = False):
    """softmax(q kᵀ) [dropout] v, fused per batch row.

    q/k/v: (B, H, S, Dh), pre-scaled q. seed: (1,) int32 — dropout stream
    (ignored when rate == 0 or not train). Differentiable w.r.t. q, k, v.
    """
    eff_rate = rate if train else 0.0
    if jax.default_backend() == "tpu" and q.shape[2] <= MAX_S:
        return _run_fwd(seed, q, k, v, eff_rate)
    return _reference(seed, q, k, v, eff_rate, True)


def _vjp_fwd(seed, q, k, v, rate, train):
    return fused_attention(seed, q, k, v, rate, train), (seed, q, k, v)


def _vjp_bwd(rate, train, res, g):
    import numpy as np

    seed, q, k, v = res
    eff_rate = rate if train else 0.0
    if jax.default_backend() == "tpu" and q.shape[2] <= MAX_S:
        dq, dk, dv = _run_bwd(seed, q, k, v, g, eff_rate)
    else:
        _, vjp = jax.vjp(lambda q, k, v: _reference(seed, q, k, v, eff_rate,
                                                    True), q, k, v)
        dq, dk, dv = vjp(g)
    seed_ct = np.zeros(seed.shape, jax.dtypes.float0)  # int arg: zero tangent
    return seed_ct, dq, dk, dv


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)
