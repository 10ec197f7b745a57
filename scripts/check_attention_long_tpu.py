#!/usr/bin/env python
"""TPU validation of the long-sequence attention kernel
(fused_attention_long): forward vs the jnp reference, full custom-VJP
grads (dseq, dw) vs reference autodiff, dropout determinism — at S=1024
(the 64px level-0 shape) and a non-power-of-two S. Prints PASS/FAIL."""
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpnf_tpu.utils.jax_setup import setup
    setup()
    from gpnf_tpu.ops.pallas import fused_attention as fa

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    ok = True
    heads = 4

    for s_len, b in [(1024, 4), (576, 4)]:
        c = 96
        seq = jnp.asarray(rng.standard_normal((b, s_len, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3 * c, c)) * 0.05, jnp.bfloat16)
        seed = jnp.zeros((1,), jnp.int32)

        @jax.jit
        def run_long(seq, w):
            return fa.fused_attention_long(seed, seq, w, heads, 0.0, False)

        @jax.jit
        def run_ref(seq, w):
            return fa._reference_qkv(seed, fa._proj(seq, w), heads, 0.0, True)

        got = np.asarray(run_long(seq, w), np.float32)
        want = np.asarray(run_ref(seq, w), np.float32)
        scale = max(np.abs(want).max(), 1.0)
        err = np.abs(got - want).max() / scale
        good = err < 2e-2
        print(f"S={s_len:4d} fwd rel err {err:.2e} "
              f"{'PASS' if good else 'FAIL'}")
        ok &= good

        @jax.jit
        def loss_long(seq, w):
            return jnp.sum(jnp.sin(fa.fused_attention_long(
                seed, seq, w, heads, 0.0, False).astype(jnp.float32)))

        @jax.jit
        def loss_ref(seq, w):
            return jnp.sum(jnp.sin(fa._reference_qkv(
                seed, fa._proj(seq, w), heads, 0.0, True)
                .astype(jnp.float32)))

        gl = jax.jit(jax.grad(loss_long, argnums=(0, 1)))(seq, w)
        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(seq, w)
        for name, a_, b_ in zip(("dseq", "dw"), gl, gr):
            a_ = np.asarray(a_, np.float32)
            b_ = np.asarray(b_, np.float32)
            scale = max(np.abs(b_).max(), 1.0)
            err = np.abs(a_ - b_).max() / scale
            good = err < 6e-2
            print(f"    bwd {name:4s} rel err {err:.2e} "
                  f"{'PASS' if good else 'FAIL'}")
            ok &= good

    # dropout: deterministic per seed, distinct across seeds + heads
    s_len, b, c = 1024, 2, 96
    seq = jnp.asarray(rng.standard_normal((b, s_len, c)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3 * c, c)) * 0.05, jnp.bfloat16)

    @jax.jit
    def run_drop(seed):
        return fa.fused_attention_long(seed, seq, w, heads, 0.2, True)

    y1 = np.asarray(run_drop(jnp.asarray([11], jnp.int32)), np.float32)
    y2 = np.asarray(run_drop(jnp.asarray([11], jnp.int32)), np.float32)
    y3 = np.asarray(run_drop(jnp.asarray([12], jnp.int32)), np.float32)
    det = np.array_equal(y1, y2) and not np.array_equal(y1, y3)
    print(f"dropout determinism {'PASS' if det else 'FAIL'}")
    ok &= det

    # grads must also compile at rate>0 (fwd/bwd masks must agree)
    @jax.jit
    def loss_drop(seq):
        return jnp.sum(fa.fused_attention_long(
            jnp.asarray([3], jnp.int32), seq, w, heads, 0.2, True)
            .astype(jnp.float32))

    gdrop = np.asarray(jax.jit(jax.grad(loss_drop))(seq), np.float32)
    fin = np.all(np.isfinite(gdrop))
    print(f"rate=0.2 grad compile+finite {'PASS' if fin else 'FAIL'}")
    ok &= bool(fin)
    print("ALL PASS" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
