"""Tensor-parallel (GSPMD) path: sharding inference + step correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from gpnf_tpu.parallel.mesh import make_mesh
from gpnf_tpu.parallel.tp import leaf_spec, make_tp_train_step, tree_shardings

KEY = jax.random.PRNGKey(0)


def test_leaf_spec_rules():
    big = np.zeros((4, 256, 128, 3, 3))
    assert leaf_spec(big, 2, min_size=1) == P(None, "model", None, None, None)
    small = np.zeros((7,))
    assert leaf_spec(small, 2, min_size=1) == P()  # indivisible
    assert leaf_spec(big, 1) == P()  # no model axis
    tiny = np.zeros((4, 4))
    assert leaf_spec(tiny, 2) == P()  # below min_size


def test_tp_step_matches_dp():
    """dp x tp GSPMD step must produce the same loss/params as single-device."""
    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow

    cfg = MarScfConfig(image_shape=(8, 8, 3), L=1, K=1, hidden_channels=16,
                       coupling="affine", use_attention=False, prior="gaussian")
    model = MarScfFlow(cfg)
    params = model.init(KEY)
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)

    def loss_fn(params, batch, rng):
        del rng
        logdet = jnp.zeros((batch.shape[0],), jnp.float32)
        _, obj = model.encode(params, batch, logdet)
        return jnp.mean(-obj) * 1e-4

    batch = jax.random.uniform(KEY, (8, 3, 8, 8)) - 0.5
    rng = jax.random.PRNGKey(1)

    mesh = make_mesh(model=2)  # 4 x 2 mesh on the 8 CPU devices
    tp_step, p_tp, o_tp = make_tp_train_step(loss_fn, opt, mesh, params,
                                             opt_state, donate=False,
                                             min_size=1 << 6)
    p_tp2, _, loss_tp = tp_step(p_tp, o_tp, batch, rng)

    @jax.jit
    def ref_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    p_ref, loss_ref = ref_step(params, opt_state, batch, rng)
    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_tp2), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
    # at least one parameter actually sharded over 'model'
    shardings = jax.tree.leaves(tree_shardings(params, mesh, min_size=1 << 6))
    assert any(s.spec != P() for s in shardings)