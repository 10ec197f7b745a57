"""GP head: blocked Cholesky correctness, NLML gradients, predictive means
vs a float64 numpy reference (fp32 tolerance — BASELINE.md target)."""
import jax
import jax.numpy as jnp
import numpy as np

from gpnf_tpu.ops.pallas.cholesky import cholesky_blocked
from gpnf_tpu.models.gp import GPConfig, GPRegression

KEY = jax.random.PRNGKey(0)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)).astype(np.float32)
    return a @ a.T + n * np.eye(n, dtype=np.float32)


def test_blocked_cholesky_small():
    a = _spd(32)
    l = np.asarray(cholesky_blocked(jnp.asarray(a), use_pallas=False))
    np.testing.assert_allclose(l @ l.T, a, rtol=2e-4, atol=2e-3)
    assert np.allclose(np.triu(l, 1), 0.0)


def test_blocked_cholesky_multiblock():
    a = _spd(320)  # pads to 384, exercises the block loop
    l = np.asarray(cholesky_blocked(jnp.asarray(a), use_pallas=False))
    ref = np.linalg.cholesky(a.astype(np.float64))
    np.testing.assert_allclose(l, ref, rtol=2e-3, atol=2e-2)


def _gp_numpy_reference(x, y, x_test, ls, var, noise, jitter):
    """float64 exact GP predictive mean."""
    x64, y64, xt = x.astype(np.float64), y.astype(np.float64), x_test.astype(np.float64)

    def k(a, b):
        d2 = ((a[:, None] - b[None]) ** 2 / ls**2).sum(-1)
        return var * np.exp(-0.5 * d2)

    kxx = k(x64, x64) + (noise + jitter) * np.eye(len(x64))
    ks = k(x64, xt)
    alpha = np.linalg.solve(kxx, y64)
    return ks.T @ alpha


def test_gp_predictive_mean_matches_fp64():
    rng = np.random.default_rng(1)
    x = rng.uniform(-3, 3, (64, 2)).astype(np.float32)
    f = np.sin(x[:, 0]) + 0.5 * np.cos(2 * x[:, 1])
    y = (f + rng.normal(0, 0.05, 64)).astype(np.float32)
    x_test = rng.uniform(-3, 3, (16, 2)).astype(np.float32)

    gp = GPRegression(GPConfig(kernel="rbf", ard=False, use_pallas_cholesky=False),
                      input_dim=2)
    params = gp.init(KEY)
    mean, var = gp.posterior(params, jnp.asarray(x), jnp.asarray(y), jnp.asarray(x_test))

    ref = _gp_numpy_reference(x, y, x_test, ls=1.0, var=1.0,
                              noise=float(np.exp(-2.0)), jitter=1e-6)
    np.testing.assert_allclose(np.asarray(mean), ref, rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(var) > 0)


def test_gp_fit_improves_nlml_and_learns():
    rng = np.random.default_rng(2)
    x = rng.uniform(-3, 3, (96, 1)).astype(np.float32)
    y = (np.sin(2 * x[:, 0]) + rng.normal(0, 0.1, 96)).astype(np.float32)

    gp = GPRegression(GPConfig(ard=False, use_pallas_cholesky=False), input_dim=1)
    params = gp.init(KEY)
    nlml0 = float(gp.neg_log_marginal_likelihood(params, jnp.asarray(x), jnp.asarray(y)))
    params, nlml1 = gp.fit(params, jnp.asarray(x), jnp.asarray(y), steps=100, lr=0.05)
    assert nlml1 < nlml0

    xt = np.linspace(-3, 3, 50, dtype=np.float32)[:, None]
    mean, _ = gp.posterior(params, jnp.asarray(x), jnp.asarray(y), jnp.asarray(xt))
    err = np.abs(np.asarray(mean) - np.sin(2 * xt[:, 0])).mean()
    assert err < 0.15, err


def test_matern_kernels_psd():
    from gpnf_tpu.models.gp import KERNELS

    x = jnp.asarray(np.random.default_rng(3).standard_normal((20, 3)).astype(np.float32))
    for name, k in KERNELS.items():
        gram = np.asarray(k(x, x, lengthscale=jnp.ones(3), variance=jnp.asarray(1.0)))
        np.testing.assert_allclose(gram, gram.T, atol=1e-5)
        eig = np.linalg.eigvalsh(gram.astype(np.float64))
        assert eig.min() > -1e-4, (name, eig.min())


def test_flow_gp_composition():
    """GP on flow-warped features end to end (tiny flow)."""
    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow
    from gpnf_tpu.models.gp import FlowGP, flow_feature_fn

    cfg = MarScfConfig(image_shape=(8, 8, 3), L=2, K=1, hidden_channels=8,
                       coupling="affine", use_attention=False, prior="gaussian")
    flow = MarScfFlow(cfg)
    flow_params = flow.init(KEY)

    n = 24
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3, 8, 8)) - 0.5
    y = jnp.sum(x, axis=(1, 2, 3))

    feat = flow_feature_fn(flow)
    d = feat(flow_params, x).shape[-1]
    fgp = FlowGP(feat, GPRegression(GPConfig(ard=False, use_pallas_cholesky=False), d))
    params = fgp.init(KEY)

    nlml = fgp.nlml(params, flow_params, x, y)
    assert np.isfinite(float(nlml))
    mean, var = fgp.posterior(params, flow_params, x, y, x[:4])
    assert mean.shape == (4,) and np.all(np.isfinite(np.asarray(mean)))


def test_cholesky_custom_vjp_matches_native():
    """The two-solve VJP (ops/pallas/cholesky.py:_chol_bwd) must agree with
    jax's native cholesky gradient — on a padded, multi-block size."""
    a = _spd(160, seed=4)

    def f_mine(m):
        return jnp.sum(jnp.sin(cholesky_blocked(m)))

    def f_native(m):
        return jnp.sum(jnp.sin(jnp.linalg.cholesky(m)))

    g_mine = np.asarray(jax.grad(f_mine)(jnp.asarray(a)))
    g_native = np.asarray(jax.grad(f_native)(jnp.asarray(a)))
    np.testing.assert_allclose(g_mine, g_native, rtol=2e-3, atol=2e-4)


def test_gp_fit_default_path_differentiates():
    """gp.fit with the DEFAULT config (use_pallas_cholesky=None) must train —
    VERDICT.md round-1 item 3(b): the factorization sits in the autodiff path."""
    rng = np.random.default_rng(5)
    x = rng.uniform(-2, 2, (48, 2)).astype(np.float32)
    y = np.sin(x[:, 0]) * np.cos(x[:, 1])

    gp = GPRegression(GPConfig(), input_dim=2)
    params = gp.init(KEY)
    nlml0 = float(gp.neg_log_marginal_likelihood(params, jnp.asarray(x), jnp.asarray(y)))
    params, loss = gp.fit(params, jnp.asarray(x), jnp.asarray(y), steps=40)
    assert np.isfinite(loss) and loss < nlml0


def test_tril_solve_matches_scipy():
    """Blocked Newton-inverse triangular solve vs reference (padded size)."""
    from gpnf_tpu.ops.pallas.trisolve import tril_solve

    rng = np.random.default_rng(7)
    n = 200  # pads to 256: exercises padding + 2-block substitution
    l = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.1)
    np.fill_diagonal(l, rng.uniform(1.0, 2.0, n).astype(np.float32))
    b = rng.standard_normal((n, 5)).astype(np.float32)

    import scipy.linalg as sla

    for trans in (False, True):
        x = np.asarray(tril_solve(jnp.asarray(l), jnp.asarray(b), trans=trans))
        ref = sla.solve_triangular(l.astype(np.float64), b, lower=True,
                                   trans="T" if trans else "N")
        np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-5)

    # vector rhs
    xv = np.asarray(tril_solve(jnp.asarray(l), jnp.asarray(b[:, 0])))
    ref = sla.solve_triangular(l.astype(np.float64), b[:, 0], lower=True)
    np.testing.assert_allclose(xv, ref, rtol=2e-4, atol=2e-5)


def test_tril_solve_rolled_large_nb():
    """nb > 16 dispatches to the fori_loop block substitution (compact HLO
    for the n=8192 recursive-Cholesky solves); values must match the
    unrolled path."""
    from gpnf_tpu.ops.pallas.trisolve import (_xla_tril_solve,
                                              _xla_tril_solve_loop)

    rng = np.random.default_rng(11)
    n = 18 * 128
    l = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.05)
    np.fill_diagonal(l, rng.uniform(1.0, 2.0, n).astype(np.float32))
    b = rng.standard_normal((n, 8)).astype(np.float32)

    for trans in (False, True):
        x = np.asarray(_xla_tril_solve_loop(jnp.asarray(l), jnp.asarray(b),
                                            trans=trans))
        resid = (l.T if trans else l).astype(np.float64) @ x - b
        assert np.abs(resid).max() < 1e-3


def test_tril_solve_vjp_matches_native():
    from gpnf_tpu.ops.pallas.trisolve import tril_solve

    rng = np.random.default_rng(8)
    n = 96
    l = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.1)
    np.fill_diagonal(l, rng.uniform(1.0, 2.0, n).astype(np.float32))
    b = rng.standard_normal((n, 3)).astype(np.float32)

    for trans in (False, True):
        def f_mine(lm, bm):
            return jnp.sum(jnp.sin(tril_solve(lm, bm, trans=trans)))

        def f_native(lm, bm):
            return jnp.sum(jnp.sin(jax.scipy.linalg.solve_triangular(
                lm, bm, lower=True, trans="T" if trans else "N")))

        gl, gb = jax.grad(f_mine, argnums=(0, 1))(jnp.asarray(l), jnp.asarray(b))
        gl_n, gb_n = jax.grad(f_native, argnums=(0, 1))(jnp.asarray(l),
                                                        jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_n),
                                   rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(np.tril(np.asarray(gl)), np.asarray(gl_n),
                                   rtol=2e-3, atol=1e-4)
