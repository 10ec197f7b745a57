"""flatten_small: the partial-flatten optimizer relayout must be a no-op
numerically (coordinate-wise transforms are invariant under raveling)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpnf_tpu.training.optim import flatten_small


def _params():
    k = jax.random.split(jax.random.PRNGKey(0), 6)
    return {
        "conv": {"w": jax.random.normal(k[0], (3, 3, 16, 32)),
                 "b": jax.random.normal(k[1], (32,))},
        "norm": {"scale": jax.random.normal(k[2], (16,)),
                 "bias": jax.random.normal(k[3], (16,)).astype(jnp.bfloat16)},
        "head": [jax.random.normal(k[4], (128, 128)),
                 jax.random.normal(k[5], (7,))],
    }


def test_flatten_small_matches_per_leaf():
    params = _params()
    inner = optax.chain(optax.add_decayed_weights(1e-4),
                        optax.adamax(1e-2))
    ref = inner
    opt = flatten_small(inner, params, threshold=4096)
    s_ref, s = ref.init(params), opt.init(params)
    p_ref = p = params
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, sub = jax.random.split(key)
        ks = jax.random.split(sub, len(jax.tree.leaves(params)))
        grads = jax.tree.unflatten(
            jax.tree.structure(params),
            [jax.random.normal(kk, l.shape, l.dtype)
             for kk, l in zip(ks, jax.tree.leaves(p))])
        u_ref, s_ref = ref.update(grads, s_ref, p_ref)
        u, s = opt.update(grads, s, p)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p = optax.apply_updates(p, u)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=1e-6, atol=1e-6)


def test_flatten_small_partition_and_jit():
    params = _params()
    opt = flatten_small(optax.adamax(1e-3), params, threshold=4096)
    state = opt.init(params)
    # only the two large leaves stay per-leaf; the rest ravel per dtype
    mu = state[0].mu
    assert len(mu["large"]) == 2
    assert set(mu["flat"]) == {"float32", "bfloat16"}
    assert mu["flat"]["float32"].shape == (32 + 16 + 7,)

    @jax.jit
    def step(p, s):
        g = jax.tree.map(jnp.ones_like, p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    p2, _ = step(params, state)
    assert jax.tree.structure(p2) == jax.tree.structure(params)
