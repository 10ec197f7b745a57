#!/usr/bin/env python
"""Micro-benchmark the fused attention Pallas kernels at headline shapes.

Isolates where the per-call time goes: forward vs backward, dropout PRNG
on/off, and the pure-dot roofline. Uses the round-3 host-readback protocol
(docs/BENCHMARKS.md "Measurement protocol"): data-dependent rep chains with
supra-ulp input perturbation and one scalar readback at the end, so neither
the enqueue-ACK lie nor the server result cache can fake a number.

Headline context (BENCH defaults, b256 flagship): 40 calls/step at
(B,S,C)=(256,256,96) level 0 + 40 at S=64 + 40 at S=16; xprof puts the
level-0 forward at ~0.49 ms/call and the backward at ~1.0 ms/call.
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--ch", type=int, default=96)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpnf_tpu.utils.jax_setup import setup as jax_setup
    jax_setup()
    from gpnf_tpu.ops.pallas.fused_attention import fused_attention_proj

    b, s, c = args.batch, args.seq, args.ch
    key = jax.random.PRNGKey(0)
    seq = (jax.random.normal(key, (b, s, c), jnp.bfloat16) * 0.5)
    # (3C, C) effective in_proj matrix, rows [k | v | q] (fused_attention_proj)
    w = jax.random.normal(jax.random.PRNGKey(1), (3 * c, c), jnp.bfloat16) * 0.05
    seed = jnp.zeros((1,), jnp.int32)

    def run(fn, label):
        f = jax.jit(fn)
        out = f(seq, w)
        jax.block_until_ready(out)
        times = []
        for _ in range(args.rounds):
            # data-dependent chain: each rep feeds the previous output back
            # in (scaled to keep magnitudes sane) so reps cannot overlap or
            # be served from the result cache; one readback at the end.
            x = seq
            t0 = time.time()
            for r in range(args.reps):
                x = f(x, w)
            _ = float(jnp.sum(x[:1, :1, :1]))
            times.append((time.time() - t0) / args.reps * 1e3)
        med = float(np.median(times))
        print(f"{label:42s} {med:8.3f} ms/call  rounds={[round(t,3) for t in times]}")
        return med

    # RTT floor for context
    tiny = jax.jit(lambda a: a + 1.0)
    x0 = jnp.zeros((), jnp.float32)
    x0 = tiny(x0); jax.block_until_ready(x0)
    t0 = time.time()
    for _ in range(5):
        x0 = tiny(x0)
    rtt = (time.time() - t0) / 5 * 1e3
    _ = float(x0)
    print(f"# chain-dispatch floor ~{rtt:.2f} ms; shapes B={b} S={s} C={c} "
          f"heads={args.heads}; device={jax.devices()[0].device_kind}")

    def fwd(rate):
        def fn(x, w):
            o = fused_attention_proj(seed, x, w, args.heads, rate=rate,
                                     train=rate > 0)
            return (o * 0.5 + x * 0.5).astype(x.dtype)
        return fn

    def fwdbwd(rate):
        def loss(x, w):
            o = fused_attention_proj(seed, x, w, args.heads, rate=rate,
                                     train=rate > 0)
            return jnp.sum((o.astype(jnp.float32)) ** 2) * 1e-4
        g = jax.grad(loss)
        def fn(x, w):
            gx = g(x, w)
            return (x * 0.9 + gx.astype(x.dtype) * 0.1).astype(x.dtype)
        return fn

    def dots_only():
        """Roofline proxy: the same dot shapes (proj + per-head scores/PV)
        without softmax/dropout/Pallas — pure XLA, same data volume."""
        dh = c // args.heads
        def fn(x, w):
            qkv = jnp.einsum("bsc,oc->bso", x, w)
            k, v, q = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
            hs = lambda t: t.reshape(b, s, args.heads, dh).transpose(0, 2, 1, 3)
            q, k, v = hs(q), hs(k), hs(v)
            sc = jnp.einsum("bhsd,bhtd->bhst", q, k)
            o = jnp.einsum("bhst,bhtd->bhsd", sc.astype(v.dtype), v)
            o = o.transpose(0, 2, 1, 3).reshape(b, s, c)
            return (o * 1e-3 + x).astype(x.dtype)
        return fn

    f_drop = run(fwd(0.2), "forward, dropout 0.2")
    f_nodrop = run(fwd(0.0), "forward, no dropout")
    fb_drop = run(fwdbwd(0.2), "forward+backward, dropout 0.2")
    fb_nodrop = run(fwdbwd(0.0), "forward+backward, no dropout")
    d = run(dots_only(), "XLA dots-only proxy (no softmax/drop)")

    print(f"# dropout cost: fwd {f_drop - f_nodrop:.3f} ms, "
          f"fwd+bwd {fb_drop - fb_nodrop:.3f} ms")
    print(f"# backward-only (drop): {fb_drop - f_drop:.3f} ms")
    print(f"# pallas fwd vs XLA dot proxy: {f_nodrop:.3f} vs {d:.3f} ms")


if __name__ == "__main__":
    main()
