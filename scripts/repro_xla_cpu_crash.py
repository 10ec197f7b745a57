#!/usr/bin/env python
"""Minimal-repro attempt for the XLA:CPU large-program crash class
(VERDICT r4 item 8; CLAUDE.md "suite-killer").

Observed in-suite: after hundreds of prior compiles in one process, the
NEXT compile of a LARGE scan-transpose program (a rematted lax.scan train
step's backward) dies with SIGSEGV/SIGABRT — in compile-cache zstd
serialization, cache read, or raw backend_compile_and_load; never
standalone, always heap-state dependent. Mitigated in CI by per-file pytest
processes (scripts/run_suite.py).

This script reproduces the suite's shape in ONE process:
  phase 1: N_FILLER distinct small jit compiles (varying shapes/dtypes so
           each is a fresh executable, like a test file's accumulation);
  phase 2: one large program — jax.grad of a rematted lax.scan over K
           copies of a conv+attention-like body with _split_transpose
           (the exact feature the crashing test exercised).

Usage:  GPNF_FORCE_CPU=1 python scripts/repro_xla_cpu_crash.py [N_FILLER]
Exit 0 = no crash (failed to reproduce at this size); a signal death is
the repro. Sweep N_FILLER (100/300/600) and GPNF_REPRO_BIG_K (8/16/32).
"""
import os
import sys

sys.path.insert(0, ".")


def main():
    n_filler = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    big_k = int(os.environ.get("GPNF_REPRO_BIG_K", 16))

    os.environ.setdefault("GPNF_FORCE_CPU", "1")
    from gpnf_tpu.utils.jax_setup import setup
    setup()
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} n_filler={n_filler} "
          f"big_K={big_k}", flush=True)

    # phase 1: heap churn via many distinct executables
    for i in range(n_filler):
        m = 8 + (i % 64)
        n = 8 + ((i * 7) % 96)
        dt = [jnp.float32, jnp.bfloat16, jnp.int32][i % 3]
        if dt == jnp.int32:
            f = jax.jit(lambda a: jnp.sum(a * 2 + i, axis=0))
            f(jnp.ones((m, n), dt)).block_until_ready()
        else:
            f = jax.jit(lambda a, b: jnp.tanh(a @ b + i).sum(axis=1))
            f(jnp.ones((m, n), dt), jnp.ones((n, m), dt)).block_until_ready()
        if (i + 1) % 100 == 0:
            print(f"  filler {i + 1}/{n_filler}", flush=True)

    # phase 2: the large scan-transpose program
    c, h, w, b = 24, 16, 16, 4

    def body(carry, p):
        x, acc = carry
        y = jax.lax.conv_general_dilated(
            x, p["w"], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        y = jnp.tanh(y)
        seq = y.reshape(b, c, h * w)
        att = jax.nn.softmax(
            jnp.einsum("bcs,bct->bst", seq, seq) / (c ** 0.5), axis=-1)
        y = (jnp.einsum("bst,bct->bcs", att, seq)).reshape(b, c, h, w)
        y = y + x
        return (y, acc + jnp.sum(y ** 2)), jnp.mean(y)

    params = {"w": jnp.ones((c, c, 3, 3)) * 0.01}
    stacked = jax.tree.map(lambda t: jnp.stack([t] * big_k), params)

    def loss(stacked, x):
        bodyc = jax.checkpoint(
            body, policy=jax.checkpoint_policies.save_only_these_names())
        (y, acc), means = jax.lax.scan(bodyc, (x, 0.0), stacked,
                                       _split_transpose=True)
        return acc + jnp.sum(means)

    print("compiling large scan-transpose grad ...", flush=True)
    g = jax.jit(jax.grad(loss))
    out = g(stacked, jnp.ones((b, c, h, w)))
    jax.block_until_ready(out)
    print("no crash: large program compiled+ran OK "
          "(failed to reproduce at this size)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
