#!/usr/bin/env python
"""Capture an xprof trace of the headline training step and print the
top HLO ops by device self-time.

Usage: python scripts/profile_train.py [--steps N] [--top K]

Writes the raw trace under /tmp/gpnf_xprof and aggregates the TPU device
plane's XEvents (tensorflow xplane proto) into a per-op table so the step
breakdown is visible without TensorBoard (VERDICT.md round-1 item 2:
"Capture an xprof trace of the 542ms step").
"""
import argparse
import collections
import glob
import os
import sys


def capture(steps: int, trace_dir: str):
    import jax
    import jax.numpy as jnp
    import optax

    from gpnf_tpu.utils.jax_setup import setup as jax_setup
    jax_setup()
    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow
    from gpnf_tpu.training.loop import bits_per_dim_loss
    from gpnf_tpu.parallel.train_step import make_train_step
    from gpnf_tpu.utils.jax_setup import init_on_cpu, to_default_device

    batch = int(os.environ.get("BENCH_BATCH", 256))
    cfg = MarScfConfig(image_shape=(32, 32, 3), L=3, K=4, hidden_channels=96,
                       coupling="mixlogcdf", compute_dtype="bfloat16",
                       remat=True, prior=os.environ.get("BENCH_PRIOR", "convlstm"),
                       num_blocks=10, use_attention=True, drop_prob=0.2)
    model = MarScfFlow(cfg)
    rng = jax.random.PRNGKey(0)
    params = to_default_device(init_on_cpu(model.init, rng))
    opt = optax.adamax(1e-4)
    opt_state = to_default_device(init_on_cpu(opt.init, params))
    step = make_train_step(bits_per_dim_loss(model), opt, mesh=None, donate=True)
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3, 32, 32)) - 0.5
    x = jnp.floor((x + 0.5) * 256.0) / 256.0 - 0.5
    x = jax.device_put(x)

    # compile + warm
    params, opt_state, loss = step(params, opt_state, x, jax.random.PRNGKey(2))
    jax.block_until_ready(loss)

    jax.profiler.start_trace(trace_dir)
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, x, jax.random.PRNGKey(3 + i))
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    print(f"# trace captured: {steps} steps -> {trace_dir}", file=sys.stderr)


def report(trace_dir: str, top: int, steps: int):
    from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb found", file=sys.stderr)
        return
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = collections.Counter()
        cnt = collections.Counter()
        plane_total = 0
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-HLO events; skip derived/step lines
            if "step" in lname or "framework" in lname:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                tot[name] += dur
                cnt[name] += 1
                plane_total += dur
        if not tot:
            continue
        print(f"\n== plane: {plane.name}  (sum of line self-times {plane_total:.1f} ms"
              f" over {steps} steps)")
        print(f"{'ms/step':>9} {'%':>6} {'count':>7}  op")
        for name, ms in tot.most_common(top):
            print(f"{ms/steps:9.3f} {100.0*ms/plane_total:6.2f} {cnt[name]:7d}  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace_dir", default="/tmp/gpnf_xprof")
    ap.add_argument("--report_only", action="store_true")
    args = ap.parse_args()
    if not args.report_only:
        os.makedirs(args.trace_dir, exist_ok=True)
        capture(args.steps, args.trace_dir)
    report(args.trace_dir, args.top, args.steps)


if __name__ == "__main__":
    main()
