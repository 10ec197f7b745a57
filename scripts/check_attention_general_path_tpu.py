#!/usr/bin/env python
"""Run the invertible attention's GENERAL patch path on the real TPU.

The image-space quadrant fast path covers every square config (the
production shapes); the general to_patches/from_patches path is what
rectangular inputs hit and was previously exercised only by CPU tests
(r3 VERDICT "what's weak" #8). This drive runs a rectangular forward +
inverse + grad on the TPU and checks round-trip/logdet/grad finiteness,
plus agreement with the CPU backend result.
"""
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from gpnf_tpu.utils.jax_setup import setup
    setup()
    from gpnf_tpu.ops.attention import InvertibleAttention

    assert jax.default_backend() != "cpu", jax.default_backend()

    c, h, w = 12, 8, 16  # rectangular: quadrant fast path does not apply
    attn = InvertibleAttention(c, 3)
    import jax.random as jr
    params = jax.device_put(attn.init(jr.PRNGKey(0)))
    x = jr.normal(jr.PRNGKey(1), (4, c, h, w))

    @jax.jit
    def fwd(p, x):
        y, ld = attn.forward(p, x, jnp.zeros((4,)))
        return y, ld

    @jax.jit
    def inv(p, y):
        x, ld = attn.inverse(p, y, jnp.zeros((4,)))
        return x, ld

    @jax.jit
    def grad_norm(p, x):
        def loss(p):
            y, ld = attn.forward(p, x, jnp.zeros((4,)))
            return jnp.sum(y**2) + jnp.sum(ld)
        g = jax.grad(loss)(p)
        return jnp.sqrt(sum(jnp.sum(l**2) for l in jax.tree.leaves(g)))

    y, ld = fwd(params, x)
    x_rec, ld_inv = inv(params, y)
    gn = float(grad_norm(params, x))

    rt = float(jnp.max(jnp.abs(x_rec - x)))
    lds = float(jnp.max(jnp.abs(ld + ld_inv)))
    print(f"TPU general path: roundtrip max|err|={rt:.2e} "
          f"logdet fwd+inv max|err|={lds:.2e} grad_norm={gn:.4f}")
    assert rt < 1e-3, rt
    assert lds < 1e-2, lds
    assert np.isfinite(gn) and gn > 0

    # cross-backend agreement (CPU reference of the same params/input)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        y_cpu, ld_cpu = attn.forward(jax.device_put(params, cpu),
                                     jax.device_put(x, cpu),
                                     jnp.zeros((4,)))
    dy = float(jnp.max(jnp.abs(np.asarray(y) - np.asarray(y_cpu))))
    dld = float(jnp.max(jnp.abs(np.asarray(ld) - np.asarray(ld_cpu))))
    print(f"TPU vs CPU: max|dy|={dy:.2e} max|dlogdet|={dld:.2e}")
    assert dy < 5e-3 and dld < 5e-2, (dy, dld)
    print("OK")


if __name__ == "__main__":
    main()
