#!/usr/bin/env python
"""TPU validation of the fused GatedConv Pallas kernel vs the jnp reference:
forward values, full backward (dx + all weight/bias grads), dropout
determinism — at the flagship's three level shapes (C=96; S=256/64/16),
bf16 and fp32. Prints PASS/FAIL per check."""
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpnf_tpu.utils.jax_setup import setup
    setup()
    from gpnf_tpu.ops.pallas import fused_gated_conv as fg

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    ok = True

    for (h, w), dtype in [((16, 16), jnp.bfloat16), ((8, 8), jnp.bfloat16),
                          ((4, 4), jnp.bfloat16), ((16, 16), jnp.float32)]:
        b, c = 32, 96
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
        w1 = jnp.asarray(rng.standard_normal((3, 3, 2 * c, c)) * 0.05, dtype)
        b1 = jnp.asarray(rng.standard_normal((c,)) * 0.1, dtype)
        wg = jnp.asarray(rng.standard_normal((2 * c, 2 * c)) * 0.05, dtype)
        bg = jnp.asarray(rng.standard_normal((2 * c,)) * 0.1, dtype)
        seed = jnp.zeros((1,), jnp.int32)

        tol = 2e-2 if dtype == jnp.bfloat16 else 2e-4

        @jax.jit
        def run_kernel(x, w1, b1, wg, bg):
            return fg._run(fg._fwd_kernel, seed, x, w1, b1, wg, bg, None, 0.0)

        @jax.jit
        def run_ref(x, w1, b1, wg, bg):
            return fg._reference(seed, x, w1, b1, wg, bg, 0.0, True)

        got = np.asarray(run_kernel(x, w1, b1, wg, bg), np.float32)
        want = np.asarray(run_ref(x, w1, b1, wg, bg), np.float32)
        scale = max(np.abs(want).max(), 1.0)
        err = np.abs(got - want).max() / scale
        print(f"S={h*w:4d} {np.dtype(dtype).name:8s} fwd rel err {err:.2e} "
              f"{'PASS' if err < tol else 'FAIL'}")
        ok &= err < tol

        # backward: kernel VJP vs jnp reference VJP
        g = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)

        @jax.jit
        def bwd_kernel(x, w1, b1, wg, bg, g):
            return fg._run(fg._bwd_kernel, seed, x, w1, b1, wg, bg, g, 0.0)

        @jax.jit
        def bwd_ref(x, w1, b1, wg, bg, g):
            _, vjp = jax.vjp(lambda *a: fg._reference(seed, *a, 0.0, True),
                             x, w1, b1, wg, bg)
            return vjp(g)

        got_g = [np.asarray(t, np.float32) for t in
                 bwd_kernel(x, w1, b1, wg, bg, g)]
        want_g = [np.asarray(t, np.float32) for t in
                  bwd_ref(x, w1, b1, wg, bg, g)]
        names = ["dx", "dw1", "db1", "dwg", "dbg"]
        for name, a_, b_ in zip(names, got_g, want_g):
            scale = max(np.abs(b_).max(), 1.0)
            err = np.abs(a_ - b_).max() / scale
            good = err < (6e-2 if dtype == jnp.bfloat16 else 1e-3)
            print(f"    bwd {name:4s} rel err {err:.2e} "
                  f"{'PASS' if good else 'FAIL'}")
            ok &= good

        # rate > 0 kernels must COMPILE and produce finite values at every
        # shape (the r5 "Sublane broadcast" failure only appeared at the
        # bench's rate=0.2 compile, which the rate=0 checks missed)
        sd = jnp.asarray([7], jnp.int32)

        @jax.jit
        def run_drop_fwd(x):
            return fg._run(fg._fwd_kernel, sd, x, w1, b1, wg, bg, None, 0.2)

        @jax.jit
        def run_drop_bwd(x, g):
            return fg._run(fg._bwd_kernel, sd, x, w1, b1, wg, bg, g, 0.2)

        fin = np.all(np.isfinite(np.asarray(run_drop_fwd(x), np.float32)))
        fin &= all(np.all(np.isfinite(np.asarray(t, np.float32)))
                   for t in run_drop_bwd(x, g))
        print(f"    rate=0.2 fwd+bwd compile+finite "
              f"{'PASS' if fin else 'FAIL'}")
        ok &= bool(fin)

    # dropout determinism on-device
    b, h, w, c = 16, 8, 8, 96
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 2 * c, c)) * 0.05, jnp.bfloat16)
    b1 = jnp.zeros((c,), jnp.bfloat16)
    wg = jnp.asarray(rng.standard_normal((2 * c, 2 * c)) * 0.05, jnp.bfloat16)
    bg = jnp.zeros((2 * c,), jnp.bfloat16)
    seed = jnp.asarray([1234], jnp.int32)

    @jax.jit
    def run_drop(seed):
        return fg._run(fg._fwd_kernel, seed, x, w1, b1, wg, bg, None, 0.5)

    y1 = np.asarray(run_drop(seed), np.float32)
    y2 = np.asarray(run_drop(seed), np.float32)
    y3 = np.asarray(run_drop(seed + 1), np.float32)
    det = np.array_equal(y1, y2) and not np.array_equal(y1, y3)
    print(f"dropout determinism {'PASS' if det else 'FAIL'}")
    ok &= det
    print("ALL PASS" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
