"""Joint flow->GP marginal-likelihood gradients — the repo's titular
capability (VERDICT r4 item 1): grads through BOTH the GP hyperparameters
and the flow parameters, verified against float64 central finite
differences; FlowGP.fit must improve the NLML and actually move the flow.

The reference contains no GP code (SURVEY.md §0); the composition spec is
BASELINE.json's north-star ("GP post-flow regression head ...
marginal-likelihood gradients").
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpnf_tpu.models.gp import FlowGP, GPConfig, GPRegression, flow_feature_fn
from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow

KEY = jax.random.PRNGKey(0)


def _tiny_flow(**overrides):
    cfg = MarScfConfig(image_shape=(8, 8, 3), L=2, K=1, hidden_channels=8,
                       coupling="affine", use_attention=False,
                       prior="gaussian", scan_steps=False, remat=False,
                       **overrides)
    return MarScfFlow(cfg)


def _data(n, dtype=jnp.float32):
    x = (jax.random.uniform(jax.random.PRNGKey(1), (n, 3, 8, 8))
         .astype(dtype) - 0.5)
    y = jnp.tanh(jnp.sum(x, axis=(1, 2, 3))).astype(dtype)
    return x, y


def test_joint_grads_match_fp64_finite_differences():
    """d NLML / d(theta) for theta spanning flow weights, actnorm, invconv,
    and GP hyperparameters, vs fp64 central differences (h = 1e-6)."""
    try:
        jax.config.update("jax_enable_x64", True)
        flow = _tiny_flow()
        flow_params = flow.init(KEY)  # float64 under x64
        x, y = _data(10, jnp.float64)

        feat = flow_feature_fn(flow)
        z0 = feat(flow_params, x)
        d = z0.shape[-1]
        gp = GPRegression(GPConfig(ard=False, use_pallas_cholesky=False,
                                   use_pallas_trisolve=False), d)
        fgp = FlowGP(feat, gp)
        # median-heuristic init: at unit lengthscale the flow latents sit
        # many lengthscales apart, the kernel saturates at ~0 and every
        # flow gradient is ~1e-9 — unresolvable against the ~1e-9 fp64
        # evaluation noise of the padded blocked factorization. The
        # responsive regime has O(1e-2..1) gradients.
        gp_hyper = gp.init_from_data(KEY, z0, y)

        joint = {"gp": gp_hyper, "flow": flow_params}
        flat, unravel = jax.flatten_util.ravel_pytree(joint)
        flat = np.asarray(flat, np.float64)

        loss_flat = jax.jit(lambda v: fgp.joint_nlml(unravel(v), x, y))
        g_auto = np.asarray(jax.jit(jax.grad(
            lambda v: fgp.joint_nlml(unravel(v), x, y)))(jnp.asarray(flat)))
        assert g_auto.dtype == np.float64 and np.all(np.isfinite(g_auto))

        # two coordinates from EVERY trainable leaf (first + middle),
        # skipping the InvConv PLU buffers `p`/`sign_s`: those are
        # stop_gradient'ed by design (reference BUFFERS — training them
        # invalidates the sum(log_s) logdet, tests/test_optim.py), so
        # autodiff correctly reports 0 there while FD sees sensitivity.
        from jax.tree_util import keystr, tree_flatten_with_path
        leaves_p, _ = tree_flatten_with_path(joint)
        idxs, names = [], {}
        off = 0
        for path, leaf in leaves_p:
            name = keystr(path)
            sz = int(np.size(leaf))
            if not ("invconv" in name and ("'p'" in name or "sign_s" in name)):
                for ci in sorted({0, sz // 2}):
                    idxs.append(off + ci)
                    names[off + ci] = name
            off += sz
        assert off == flat.size
        # h sized against the ~1e-9 fp64 evaluation noise of the blocked
        # factorization: FD noise ~ noise/h = 1e-5, truncation ~ h^2 f'''
        h = 1e-4
        n_nonzero = 0
        for i in idxs:
            e = np.zeros_like(flat)
            e[i] = h
            fd = (float(loss_flat(jnp.asarray(flat + e)))
                  - float(loss_flat(jnp.asarray(flat - e)))) / (2 * h)
            tol = 5e-5 + 1e-3 * abs(fd)
            assert abs(fd - g_auto[i]) < tol, (names[i], i, fd, g_auto[i])
            n_nonzero += abs(g_auto[i]) > 1e-4
        # the check must be exercising real gradients, not a sea of zeros
        # (many conv-weight coordinates legitimately have tiny gradients at
        # a random init; a dozen O(1e-4+) ones across components is the
        # signal that the chain rule through flow AND GP is being tested)
        assert n_nonzero >= 10, (n_nonzero, len(idxs))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_joint_fit_improves_nlml_and_moves_flow():
    flow = _tiny_flow()
    flow_params = flow.init(KEY)
    x, y = _data(32)

    feat = flow_feature_fn(flow)
    d = feat(flow_params, x).shape[-1]
    fgp = FlowGP(feat, GPRegression(
        GPConfig(ard=False, use_pallas_cholesky=False), d))
    params = fgp.init(KEY)

    nlml0 = float(fgp.nlml(params, flow_params, x, y))
    params2, flow_params2, losses = fgp.fit(params, flow_params, x, y,
                                            steps=40, lr=0.02)
    assert losses.shape == (40,) and np.all(np.isfinite(losses))
    assert float(losses[-1]) < nlml0, (losses[-1], nlml0)
    # the flow must have moved: joint training, not GP-hypers-only
    delta = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree.leaves(flow_params2),
                                jax.tree.leaves(flow_params)))
    assert delta > 1e-5, delta
    # posterior at the fitted joint params is finite and usable
    mean, var = fgp.posterior(params2, flow_params2, x, y, x[:4])
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(var) > 0)


def test_frozen_flow_baseline_keeps_flow_fixed():
    flow = _tiny_flow()
    flow_params = flow.init(KEY)
    x, y = _data(24)

    feat = flow_feature_fn(flow)
    d = feat(flow_params, x).shape[-1]
    fgp = FlowGP(feat, GPRegression(
        GPConfig(ard=False, use_pallas_cholesky=False), d))
    params = fgp.init(KEY)

    _, flow_params2, losses = fgp.fit(params, flow_params, x, y, steps=20,
                                      lr=0.05, train_flow=False)
    assert float(losses[-1]) < float(losses[0])
    for a, b in zip(jax.tree.leaves(flow_params2),
                    jax.tree.leaves(flow_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_joint_fit_with_mixlogcdf_attention_flow():
    """The composition must also differentiate through the FLAGSHIP step
    type (mixlogcdf coupling + invertible attention + scan + remat)."""
    cfg = MarScfConfig(image_shape=(8, 8, 3), L=2, K=2, hidden_channels=8,
                       coupling="mixlogcdf", use_attention=True,
                       num_blocks=1, num_components=4, drop_prob=0.0,
                       prior="gaussian")
    flow = MarScfFlow(cfg)
    flow_params = flow.init(KEY)
    x, y = _data(16)

    feat = flow_feature_fn(flow)
    z0 = feat(flow_params, x)
    gp = GPRegression(GPConfig(ard=False, use_pallas_cholesky=False),
                      z0.shape[-1])
    fgp = FlowGP(feat, gp)
    params = {"gp": gp.init_from_data(KEY, z0, y)}

    params2, flow_params2, losses = fgp.fit(params, flow_params, x, y,
                                            steps=8, lr=0.01)
    assert np.all(np.isfinite(losses)) and float(losses[-1]) < float(losses[0])
    delta = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree.leaves(flow_params2),
                                jax.tree.leaves(flow_params)))
    assert delta > 1e-6, delta
