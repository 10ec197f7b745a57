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

sys.path.insert(0, ".")


def capture_sample(steps: int, trace_dir: str):
    """Trace the full ancestral sampling path (reverse flow + AR priors)."""
    import jax

    from gpnf_tpu.utils.jax_setup import setup as jax_setup
    jax_setup()
    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow
    from gpnf_tpu.utils.jax_setup import init_on_cpu, to_default_device

    batch = int(os.environ.get("BENCH_BATCH", 64))
    cfg = MarScfConfig(image_shape=(32, 32, 3), L=3, K=4, hidden_channels=96,
                       coupling="mixlogcdf", compute_dtype="bfloat16")
    model = MarScfFlow(cfg)
    params = to_default_device(init_on_cpu(model.init, jax.random.PRNGKey(0)))
    sample = jax.jit(lambda p, r: model.sample(p, r, batch=batch, eps_std=1.0))
    out = sample(params, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    jax.profiler.start_trace(trace_dir)
    rng = jax.random.PRNGKey(2)
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        out = sample(params, sub)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print(f"# sampling trace: {steps} batches of {batch} -> {trace_dir}",
          file=sys.stderr)


def capture_srflow(steps: int, trace_dir: str):
    """Trace the SRFlow 80px K=8 training step (VERDICT r2 item 7: give the
    SRFlow side the same step-anatomy table the mAR-SCF side has)."""
    import jax
    import jax.numpy as jnp

    from gpnf_tpu.utils.jax_setup import setup as jax_setup
    jax_setup()
    from gpnf_tpu.models.srflow import SRFlowConfig, SRFlowNet
    from gpnf_tpu.training.srflow_loop import (SRTrainConfig,
                                               make_srflow_optimizer,
                                               make_srflow_train_step)
    from gpnf_tpu.utils.jax_setup import init_on_cpu, to_default_device

    batch = int(os.environ.get("BENCH_BATCH", 16))
    cfg = SRFlowConfig(scale=4, hr_size=80, K=8, L=3, rrdb_nb=8,
                       stack_blocks=(1, 4, 7))
    model = SRFlowNet(cfg)
    params = to_default_device(init_on_cpu(model.init, jax.random.PRNGKey(0)))
    tcfg = SRTrainConfig(niter=1000, batch_size=batch)
    opt, mask = make_srflow_optimizer(tcfg, params)
    opt_state = to_default_device(init_on_cpu(opt.init, params))
    step = make_srflow_train_step(model, tcfg, opt, mask)
    lr = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3, 20, 20))
    hr = jax.random.uniform(jax.random.PRNGKey(2), (batch, 3, 80, 80))
    rng = jax.random.PRNGKey(3)
    for i in range(2):  # second call recompiles once (opt-state promotion)
        params, opt_state, loss = step(params, opt_state, lr, hr, rng,
                                       jnp.asarray(i))
        jax.block_until_ready(loss)
    jax.profiler.start_trace(trace_dir)
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, lr, hr, sub,
                                       jnp.asarray(i + 2))
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    print(f"# srflow trace captured: {steps} steps -> {trace_dir}",
          file=sys.stderr)


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
    size = int(os.environ.get("BENCH_IMAGE", 32))  # 64 = ImageNet-64 row
    cfg = MarScfConfig(image_shape=(size, size, 3), L=3, K=4,
                       hidden_channels=96,
                       coupling="mixlogcdf", compute_dtype="bfloat16",
                       remat=os.environ.get("BENCH_REMAT", "1") == "1",
                       remat_mode=os.environ.get("BENCH_REMAT_MODE", "noattn"),
                       scan_unroll=int(os.environ.get("BENCH_SCAN_UNROLL", 0)),
                       precompute_wn=os.environ.get(
                           "BENCH_PRECOMPUTE_WN", "0") == "1",
                       remat_save_names=os.environ.get(
                           "BENCH_SAVE_NAMES", "remat_ckpt,wcast,attn_out"),
                       prior=os.environ.get("BENCH_PRIOR", "convlstm"),
                       num_blocks=10, use_attention=True, drop_prob=0.2)
    model = MarScfFlow(cfg)
    rng = jax.random.PRNGKey(0)
    params = to_default_device(init_on_cpu(model.init, rng))
    opt = optax.adamax(1e-4)
    flat_mode = os.environ.get("BENCH_FLAT_OPT", "small")
    if flat_mode == "small":
        # match the production/headline optimizer layout
        from gpnf_tpu.training.optim import flatten_small
        opt = flatten_small(opt, params)
    elif flat_mode == "1":
        opt = optax.flatten(opt)
    opt_state = to_default_device(init_on_cpu(opt.init, params))
    step = make_train_step(bits_per_dim_loss(model), opt, mesh=None, donate=True)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (batch, 3, size, size)) - 0.5
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
    """Aggregate the TPU plane's 'XLA Ops' line: leaf ops only (while/call
    parents span their children and would double count), grouped by op type
    and by individual op, plus the shape signatures of the data-movement
    buckets (copy/reshape/checkpoint — the usual TPU flow-model overheads)."""
    import re

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb found", file=sys.stderr)
        return
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    parent = re.compile(r"^%?(while|conditional|call)")
    shape_re = re.compile(r"= \(?([a-z0-9]+\[[0-9,]*\])")
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        lines = [l for l in plane.lines if l.name == "XLA Ops"]
        if not lines:
            continue
        by_type = collections.Counter()
        n_type = collections.Counter()
        by_shape = collections.Counter()
        n_shape = collections.Counter()
        by_fusion = collections.Counter()
        n_fusion = collections.Counter()
        grand = 0.0
        for ev in lines[0].events:
            name = ev_meta.get(ev.metadata_id, "?")
            base = name.split(" ")[0].lstrip("%")
            if parent.match(base):
                continue
            typ = base.split(".")[0]
            d = ev.duration_ps / 1e9
            by_type[typ] += d
            n_type[typ] += 1
            grand += d
            m = shape_re.search(name)
            sig = f"{typ} {m.group(1)}" if m else typ
            if typ in ("copy", "reshape", "checkpoint", "transpose"):
                by_shape[sig] += d
                n_shape[sig] += 1
            elif "fusion" in typ or typ in ("custom-call", "closed_call",
                                            "rematted_computation"):
                by_fusion[sig] += d
                n_fusion[sig] += 1
        print(f"\n== {plane.name}: leaf-op device time "
              f"{grand/steps:.1f} ms/step ({steps} steps)")
        print(f"{'ms/step':>9} {'%':>6} {'count':>8}  op type")
        for t, ms in by_type.most_common(top):
            print(f"{ms/steps:9.3f} {100*ms/grand:6.2f} {n_type[t]:8d}  {t}")
        print("\ndata-movement shapes:")
        for t, ms in by_shape.most_common(20):
            print(f"{ms/steps:9.3f} {100*ms/grand:6.2f} {n_shape[t]:8d}  {t}")
        print("\ncompute fusions by output shape (attributes the generic "
              "'fusion' bucket):")
        for t, ms in by_fusion.most_common(25):
            print(f"{ms/steps:9.3f} {100*ms/grand:6.2f} {n_fusion[t]:8d}  {t}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace_dir", default="/tmp/gpnf_xprof")
    ap.add_argument("--report_only", action="store_true")
    ap.add_argument("--mode", choices=("train", "sample", "srflow"),
                    default="train")
    args = ap.parse_args()
    if not args.report_only:
        os.makedirs(args.trace_dir, exist_ok=True)
        if args.mode == "sample":
            capture_sample(args.steps, args.trace_dir)
        elif args.mode == "srflow":
            capture_srflow(args.steps, args.trace_dir)
        else:
            capture(args.steps, args.trace_dir)
    report(args.trace_dir, args.top, args.steps)


if __name__ == "__main__":
    main()
