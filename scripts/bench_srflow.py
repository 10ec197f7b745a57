#!/usr/bin/env python
"""SRFlow training-step throughput on the local accelerator.

Default is a mid-size config (quarter-size crops, half-depth RRDB) so the
single-core host can compile it in minutes; set BENCH_FULL=1 for the
reference-scale 160px K=16 nb=23 model.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpnf_tpu.utils.jax_setup import setup, init_on_cpu, to_default_device
    setup()
    from gpnf_tpu.models.srflow import SRFlowConfig, SRFlowNet
    from gpnf_tpu.training.srflow_loop import (SRTrainConfig,
                                               make_srflow_optimizer,
                                               make_srflow_train_step)

    full = os.environ.get("BENCH_FULL", "0") == "1"
    batch = int(os.environ.get("BENCH_BATCH", 16 if full else 16))
    # r4 levers (docs/BENCHMARKS.md SRFlow perf pass): bf16 compute path
    # (RRDB + coupling hiddens on the MXU in bf16) and named-save remat
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    save_names = os.environ.get("BENCH_SAVE_NAMES", "")
    # r5 program-shape levers (VERDICT r4 item 4): remat_mode="noattn"
    # (sub-step coupling checkpoint, no scan-body barrier) x scan_unroll=0
    # (full K-unroll) — the pairing that won +10% on the flagship
    remat_mode = os.environ.get("BENCH_REMAT_MODE", "body")
    scan_unroll = int(os.environ.get("BENCH_SCAN_UNROLL", 1))
    extra = dict(compute_dtype=dtype, remat_save_names=save_names,
                 remat_mode=remat_mode, scan_unroll=scan_unroll)
    dtag = "_bf16" if dtype == "bfloat16" else ""
    if remat_mode != "body" or scan_unroll != 1:
        dtag += f"_{remat_mode}_u{scan_unroll}"
    if full:
        cfg = SRFlowConfig(scale=4, hr_size=160, K=16, L=3, rrdb_nb=23,
                           **extra)
        tag = f"srflow_160px_K16_nb23{dtag}"
    else:
        cfg = SRFlowConfig(scale=4, hr_size=80, K=8, L=3, rrdb_nb=8,
                           stack_blocks=(1, 4, 7), **extra)
        tag = f"srflow_80px_K8_nb8{dtag}"

    model = SRFlowNet(cfg)
    params = to_default_device(init_on_cpu(model.init, jax.random.PRNGKey(0)))
    tcfg = SRTrainConfig(niter=1000, batch_size=batch)
    opt, mask = make_srflow_optimizer(tcfg, params)
    opt_state = to_default_device(init_on_cpu(opt.init, params))
    step = make_srflow_train_step(model, tcfg, opt, mask)

    lr = jax.random.uniform(jax.random.PRNGKey(1),
                            (batch, 3, cfg.hr_size // 4, cfg.hr_size // 4))
    hr = jax.random.uniform(jax.random.PRNGKey(2), (batch, 3, cfg.hr_size,
                                                    cfg.hr_size))
    rng = jax.random.PRNGKey(3)

    t0 = time.time()
    # two warmups: the second call recompiles once (opt-state weak->strong
    # dtype promotion after the first update)
    for i in range(2):
        params, opt_state, loss = step(params, opt_state, lr, hr, rng,
                                       jnp.asarray(i))
        jax.block_until_ready(loss)
    compile_s = time.time() - t0

    # bench.py protocol: 3 in-process measurement rounds, report the median
    # with spread so one number carries its own error bar (the r2 single-shot
    # runs spread 104-244 ms/step on tunnel timing noise).
    reps = 10
    rounds = []
    losses = []
    for _ in range(3):
        t0 = time.time()
        for i in range(reps):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, lr, hr, sub,
                                           jnp.asarray(i + 2))
            # true host readback per step: over the axon tunnel
            # block_until_ready resolves on enqueue-ACK, not completion
            # (docs/BENCHMARKS.md measurement protocol)
            losses.append(float(loss))
        rounds.append((time.time() - t0) / reps)
    assert losses[-1] != losses[0], "loss did not change; measurement invalid"
    rounds.sort()
    dt = rounds[1]
    spread = (rounds[-1] - rounds[0]) / dt

    # chained-dispatch device time: `reps` full train steps inside ONE
    # dispatch (params/opt state carried through lax.fori_loop), so the
    # axon-tunnel RTT + per-step host work is paid once. This is the pure
    # device step time a local host would see.
    def chained(p, s, r):
        def body(i, carry):
            p_, s_, r_, _ = carry
            r_, sub = jax.random.split(r_)
            p_, s_, l_ = step(p_, s_, lr, hr, sub, i + 2)
            return (p_, s_, r_, l_)
        return jax.lax.fori_loop(0, reps, body,
                                 (p, s, r, jnp.asarray(0.0)))

    chained_j = jax.jit(chained)
    t0 = time.time()
    float(chained_j(params, opt_state, rng)[3])  # host readback = completion
    chain_compile_s = time.time() - t0
    t0 = time.time()
    float(chained_j(params, opt_state, rng)[3])
    dt_dev = (time.time() - t0) / reps

    print(json.dumps({"metric": f"{tag}_train_throughput",
                      "value": round(batch / dt, 2), "unit": "images/sec/chip",
                      "step_ms": round(dt * 1e3, 1),
                      "spread": round(spread, 4),
                      "repeats_ms": [round(r * 1e3, 1) for r in rounds],
                      "device_img_s": round(batch / dt_dev, 2),
                      "device_step_ms": round(dt_dev * 1e3, 1),
                      "compile_s": round(compile_s + chain_compile_s, 1),
                      "loss": round(float(loss), 3)}))


if __name__ == "__main__":
    main()
