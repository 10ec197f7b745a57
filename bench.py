#!/usr/bin/env python
"""Headline benchmark: CIFAR10 mAR-SCF MixLogCDF (K=4, C=96, batch 64)
training throughput in images/sec/chip on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: ratio against an estimated A100 PyTorch throughput of the
reference implementation on the same config (BASELINE.json north-star asks
for >=3x A100 img/s/chip). The reference publishes no throughput number and
both its logged benchmark runs crashed (BASELINE.md), so we use a documented
estimate: Flow++-class models (10 gated conv-attn blocks, K=4, L=3, C=96)
train at roughly 200 img/s on a single A100 under PyTorch eager. Keep this
constant until a measured baseline exists.
"""
import json
import os
import sys
import time

A100_BASELINE_IMG_S = 200.0

# 256 saturates a v5e chip (see docs/BENCHMARKS.md); the reference trains
# this config at 64 — override with BENCH_BATCH to compare like-for-like.
BATCH = int(os.environ.get("BENCH_BATCH", 256))
WARMUP = int(os.environ.get("BENCH_WARMUP", 3))
STEPS = int(os.environ.get("BENCH_STEPS", 20))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from gpnf_tpu.utils.jax_setup import setup as jax_setup
    jax_setup()

    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow
    from gpnf_tpu.training.loop import bits_per_dim_loss
    from gpnf_tpu.parallel.train_step import make_train_step

    from gpnf_tpu.utils.jax_setup import init_on_cpu, to_default_device

    cfg = MarScfConfig(image_shape=(32, 32, 3), L=3, K=4, hidden_channels=96,
                       coupling="mixlogcdf",
                       compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
                       remat=os.environ.get("BENCH_REMAT", "1") == "1",
                       remat_mode=os.environ.get("BENCH_REMAT_MODE", "body"),
                       scan_steps=os.environ.get("BENCH_SCAN", "1") == "1",
                       remat_levels=(tuple(int(i) for i in
                                     os.environ["BENCH_REMAT_LEVELS"].split(","))
                                     if os.environ.get("BENCH_REMAT_LEVELS")
                                     else None),
                       prior=os.environ.get("BENCH_PRIOR", "convlstm"),
                       num_blocks=int(os.environ.get("BENCH_NN_BLOCKS", 10)),
                       use_attention=os.environ.get("BENCH_ATTN", "1") == "1",
                       drop_prob=float(os.environ.get("BENCH_DROP", 0.2)))
    model = MarScfFlow(cfg)
    rng = jax.random.PRNGKey(0)
    params = to_default_device(init_on_cpu(model.init, rng))

    opt = optax.adamax(1e-4)
    opt_state = to_default_device(init_on_cpu(opt.init, params))
    step = make_train_step(bits_per_dim_loss(model), opt, mesh=None, donate=True)

    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 3, 32, 32)) - 0.5

    t_compile = time.time()
    for i in range(WARMUP):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, x, sub)
    jax.block_until_ready(loss)
    compile_s = time.time() - t_compile

    # block every step: over the remote-TPU tunnel, blocking only on the
    # final loss can report buffer-ready far earlier than real completion
    t0 = time.time()
    losses = []
    for i in range(STEPS):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, x, sub)
        losses.append(float(loss))
    dt = time.time() - t0
    assert losses[-1] != losses[0], "loss did not change; measurement invalid"

    img_s = BATCH * STEPS / dt

    # MFU: XLA's own cost analysis of the compiled step / measured time /
    # chip peak. Peak bf16 FLOP/s per chip: v5e 197e12, v5p 459e12 (public
    # spec sheets); fall back to v5e if the kind is unrecognized.
    mfu = None
    try:
        compiled = jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__")
                           else step).lower(params, opt_state, x, rng).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_per_step = float(cost.get("flops", 0.0))
        kind = jax.devices()[0].device_kind.lower()
        peak = 459e12 if "v5p" in kind or "v5 p" in kind else 197e12
        if flops_per_step > 0:
            mfu = flops_per_step / (dt / STEPS) / peak
    except Exception as e:  # cost analysis is best-effort
        print(f"# mfu unavailable: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "cifar10_mixlogcdf_K4_C96_train_throughput",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / A100_BASELINE_IMG_S, 3),
        **({"mfu": round(mfu, 4)} if mfu is not None else {}),
    }))
    print(f"# device={jax.devices()[0].device_kind} batch={BATCH} steps={STEPS} "
          f"step_time={dt/STEPS*1e3:.1f}ms warmup+compile={compile_s:.1f}s "
          f"loss={float(loss):.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
