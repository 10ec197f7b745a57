#!/usr/bin/env python
"""Assembled video-SR (MDVR_CA_SA-equivalent) training-step throughput.

Same measurement protocol as bench.py / bench_srflow.py: per-step host
readback (block_until_ready resolves on tunnel enqueue-ACK), 3 in-process
rounds, median + spread, plus a fori_loop-chained device-time number.
Reference pipeline: /root/reference/MDVR_cascade_v41_arch.py:51-185.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from gpnf_tpu.utils.jax_setup import setup, init_on_cpu, to_default_device
    setup()
    from gpnf_tpu.models.video_sr import (VideoSR, VideoSRConfig,
                                          charbonnier_sr_loss)
    from gpnf_tpu.parallel.train_step import make_train_step

    batch = int(os.environ.get("BENCH_BATCH", 8))
    size = int(os.environ.get("BENCH_LR_SIZE", 32))
    cfg = VideoSRConfig()
    model = VideoSR(cfg)
    params = to_default_device(init_on_cpu(model.init, jax.random.PRNGKey(0)))
    opt = optax.flatten(optax.adam(2e-4))
    opt_state = to_default_device(init_on_cpu(opt.init, params))
    step = make_train_step(charbonnier_sr_loss(model), opt, mesh=None,
                           donate=True)

    scale = cfg.total_scale
    clips = jax.random.uniform(
        jax.random.PRNGKey(1), (batch, cfg.nframes, 3, size, size))
    hr = jax.random.uniform(
        jax.random.PRNGKey(2), (batch, 3, size * scale, size * scale))
    rng = jax.random.PRNGKey(3)

    t0 = time.time()
    for _ in range(2):  # second call recompiles once (opt-state promotion)
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, (clips, hr), sub)
        float(loss)
    compile_s = time.time() - t0

    reps = int(os.environ.get("BENCH_REPS", 10))
    rounds, losses = [], []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, (clips, hr), sub)
            losses.append(float(loss))  # true host readback per step
        rounds.append((time.time() - t0) / reps)
    assert losses[-1] != losses[0], "loss did not change; measurement invalid"
    rounds.sort()
    dt = rounds[1]
    spread = (rounds[-1] - rounds[0]) / dt

    def chained(p, s, r):
        def body(i, carry):
            p_, s_, r_, _ = carry
            r_, sub = jax.random.split(r_)
            p_, s_, l_ = step(p_, s_, (clips, hr), sub)
            return (p_, s_, r_, l_)
        return jax.lax.fori_loop(0, reps, body, (p, s, r, jnp.asarray(0.0)))

    chained_j = jax.jit(chained)
    t0 = time.time()
    float(chained_j(params, opt_state, rng)[3])
    chain_compile_s = time.time() - t0
    t0 = time.time()
    float(chained_j(params, opt_state, rng)[3])  # readback = real completion
    dt_dev = (time.time() - t0) / reps

    print(json.dumps({
        "metric": f"video_sr_{cfg.align}_{cfg.fusion}_x{scale}_train_throughput",
        "value": round(batch / dt, 2), "unit": "clips/sec/chip",
        "step_ms": round(dt * 1e3, 1), "spread": round(spread, 4),
        "repeats_ms": [round(r * 1e3, 1) for r in rounds],
        "device_clips_s": round(batch / dt_dev, 2),
        "device_step_ms": round(dt_dev * 1e3, 1),
        "lr_size": size, "hr_size": size * scale, "batch": batch,
        "compile_s": round(compile_s + chain_compile_s, 1),
        "loss": round(float(loss), 4)}))


if __name__ == "__main__":
    main()
