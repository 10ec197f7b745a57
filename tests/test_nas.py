"""NAS layer: searchable ops (ops/searchable.py) + gumbel supernet
(models/nas.py).

Reference capability: model_search.py:31-60 (gumbel), 133-392 (MixedOp/Cell),
396-824 (NAS_GAN, losses, arch params) and operations.py:832-1768 (slimmable/
quantizable op library + OPS registries) — dead there, live here.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpnf_tpu.models.nas import (ATTN_OPS, NASConfig, NASVideoSR,
                                 PerceptualFeatures, PRIMITIVES_ATTN, Cell,
                                 CellAttn, MixedOp, genotype, gumbel_softmax)
from gpnf_tpu.ops.searchable import (OPS, PRIMITIVES, USConv2d,
                                     fake_quant_int8, make_divisible,
                                     xla_op_flops)

TINY = NASConfig(nf=8, num_frames=3, center=1, num_cell=2, op_per_cell=2,
                 num_cell_attn=1, op_per_cell_attn=1)


# ---------------------------------------------------------------- primitives
def test_gumbel_softmax_hard_is_onehot_with_grads():
    logits = jnp.array([0.1, 0.5, 0.2])
    y = gumbel_softmax(jax.random.PRNGKey(0), logits, hard=True)
    assert jnp.allclose(jnp.sum(y), 1.0)
    assert jnp.sum(y == 1.0) == 1  # exact one-hot values (ST estimator)
    g = jax.grad(lambda l: jnp.sum(
        gumbel_softmax(jax.random.PRNGKey(0), l, hard=True) * logits))(logits)
    assert jnp.any(g != 0)  # gradient flows through the soft sample


def test_usconv_mask_matches_sliced_conv():
    """Full-width masked compute == slicing weights to the active widths."""
    conv = USConv2d(8, 8, 3)
    p = conv.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 6, 6))
    y = conv.apply(p, x, ratio=(0.5, 0.75))
    a_in, a_out = make_divisible(8 * 0.5), make_divisible(8 * 0.75)
    assert jnp.all(y[:, a_out:] == 0)
    from gpnf_tpu.ops.convrnn import _convnd
    want = _convnd(x[:, :a_in], p["w"][:a_out, :a_in], None, ndim=2)
    np.testing.assert_allclose(np.asarray(y[:, :a_out]), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fake_quant_int8_ste():
    x = jnp.linspace(-1.0, 1.0, 64)
    q = fake_quant_int8(x)
    assert jnp.max(jnp.abs(q - x)) <= jnp.max(jnp.abs(x)) / 127.0 + 1e-6
    g = jax.grad(lambda v: jnp.sum(fake_quant_int8(v) ** 2))(x)
    assert jnp.all(jnp.isfinite(g)) and jnp.any(g != 0)


@pytest.mark.parametrize("name", list(PRIMITIVES))
def test_each_primitive_forward_and_flops(name):
    op = OPS[name](8, 8, 1)
    p = op.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    y = op.apply(p, x, ratio=(1.0, 1.0))
    assert y.shape == x.shape and jnp.all(jnp.isfinite(y))
    yq = op.apply(p, x, ratio=(1.0, 1.0), quantize=True)
    assert yq.shape == x.shape
    fl, size = op.flops((8, 8, 8), (1.0, 1.0))
    fl_half, _ = op.flops((8, 8, 8), (0.5, 0.5))
    assert fl > 0 and fl_half < fl
    assert size == (8, 8, 8)


def test_xla_op_flops_positive_and_cached():
    f1 = xla_op_flops("conv3x3", (8, 8, 8))
    f2 = xla_op_flops("conv3x3", (8, 8, 8))
    assert f1 > 0 and f1 == f2
    assert xla_op_flops("skip", (8, 8, 8)) < f1  # 1x1 cheaper than 3x3


# --------------------------------------------------------------- mixed/cells
def test_mixedop_weighted_sum_and_quantize_blend():
    op = MixedOp(8, 8, 1, quantize="search")
    p = op.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    n = len(PRIMITIVES)
    alpha = jax.nn.one_hot(1, n)  # pure conv3x3
    beta = jnp.array([1.0, 0.0])  # no quantization
    y = op.apply(p, x, alpha, beta, (1.0, 1.0))
    want = op.ops[1].apply(p[1], x, (1.0, 1.0), quantize=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_cell_residual_structure():
    cell = Cell(8, op_per_cell=2)
    p = cell.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    n = len(PRIMITIVES)
    alpha = jnp.full((2, n), 1.0 / n)
    beta = jnp.full((2, 2), 0.5)
    y = cell.apply(p, x, alpha, beta, [1.0])
    assert y.shape == x.shape and jnp.all(jnp.isfinite(y))


def test_cell_attn_forward():
    cell = CellAttn(num_frames=3, nf=8, op_per_cell=1)
    p = cell.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 8, 8))
    na = len(PRIMITIVES_ATTN)
    y = cell.apply(p, x, jnp.full((1, na, na), 0.5),
                   jnp.full((1, 2 * na), 0.25), jnp.full((1, 2 * na, 3), 1/3))
    assert y.shape == x.shape and jnp.all(jnp.isfinite(y))


# ----------------------------------------------------------------- supernet
def test_supernet_forward_and_both_grads():
    model = NASVideoSR(TINY)
    params = model.init(jax.random.PRNGKey(0))
    arch = model.init_arch()
    clips = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 3, 8, 8))
    hr = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 128, 128))
    feat = PerceptualFeatures()

    def loss(p, a):
        sr = model.apply(p, a, clips, jax.random.PRNGKey(3))
        return model.criterion_image(sr, hr, feature_fn=feat)

    sr = jax.jit(lambda p, a: model.apply(p, a, clips))(params, arch)
    assert sr.shape == (1, 3, 128, 128)
    lv, (gp, ga) = jax.value_and_grad(loss, argnums=(0, 1))(params, arch)
    assert jnp.isfinite(lv)
    assert any(jnp.any(g != 0) for g in jax.tree_util.tree_leaves(gp))
    # arch gradients reach every arch tensor family that the forward uses
    assert jnp.any(ga["alpha"] != 0)
    assert jnp.any(ga["beta"] != 0)
    assert jnp.any(ga["alpha_sink"] != 0)
    assert jnp.any(ga["alpha_att_levels"] != 0)


def test_supernet_prun_modes_and_style_loss():
    model = NASVideoSR(TINY)
    params = model.init(jax.random.PRNGKey(0))
    arch = model.init_arch()
    clips = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 3, 8, 8))
    for mode in ("max", "min"):
        sr = model.apply(params, arch, clips, prun_mode=mode)
        assert jnp.all(jnp.isfinite(sr))
    s = model.style_loss(sr, jnp.zeros_like(sr))
    assert jnp.isfinite(s) and s >= 0


def test_arch_flops_monotone_in_ratio_logits():
    model = NASVideoSR(TINY)
    arch = model.init_arch()
    n_w = len(NASConfig.width_mults)
    arch_max = dict(arch, ratio=jax.nn.one_hot(
        jnp.full(arch["ratio"].shape[:-1], n_w - 1, dtype=jnp.int32), n_w))
    arch_min = dict(arch, ratio=jax.nn.one_hot(
        jnp.zeros(arch["ratio"].shape[:-1], dtype=jnp.int32), n_w))
    f_max = model.arch_flops(arch_max, (8, 8))
    f_min = model.arch_flops(arch_min, (8, 8))
    assert f_max > f_min > 0


def test_arch_flops_expected_differentiable_and_consistent():
    """The jittable E[FLOPs] penalty must carry nonzero gradients into both
    alpha and ratio, and agree with the host-side arch_flops at one-hot
    arch params (where E[width] == argmax width)."""
    model = NASVideoSR(TINY)
    arch = model.init_arch()
    tab = model.flops_table((8, 8))

    g = jax.grad(lambda a: model.arch_flops_expected(a, tab))(arch)
    assert jnp.any(g["alpha"] != 0) and jnp.any(g["ratio"] != 0)

    n_w = len(NASConfig.width_mults)
    hot = dict(arch,
               alpha=10.0 * jax.nn.one_hot(
                   jnp.zeros(arch["alpha"].shape[:-1], jnp.int32),
                   arch["alpha"].shape[-1]) * 100,
               ratio=100.0 * jax.nn.one_hot(
                   jnp.full(arch["ratio"].shape[:-1], n_w - 1, jnp.int32),
                   n_w))
    want = model.arch_flops(hot, (8, 8))
    got = float(model.arch_flops_expected(hot, tab))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_cell_flops_op_per_cell_one():
    """op_per_cell=1: apply uses the (1.0, 1.0) pair and flops must too
    (regression: ratio[0] on an empty per-cell ratio list)."""
    cell = Cell(8, op_per_cell=1)
    n = len(PRIMITIVES)
    fl, size = cell.flops((8, 8, 8), jnp.full((1, n), 1.0 / n), [])
    assert fl > 0 and size == (8, 8, 8)


def test_supernet_init_scales_with_num_cell():
    """init's key split is sized from the config (regression: fixed 32-way
    split raised StopIteration at num_cell >= 11)."""
    cfg = NASConfig(nf=4, num_frames=3, center=1, num_cell=12, op_per_cell=1,
                    num_cell_attn=1, op_per_cell_attn=1)
    model = NASVideoSR(cfg)
    p = model.init(jax.random.PRNGKey(0))
    assert len(p["cells_pre"]) == 12 and len(p["cells_recon"]) == 12


def test_supernet_decorrelated_stage_widths(monkeypatch):
    """apply() draws one INDEPENDENT width sample per conv stage (the
    reference resamples prun_ratio between the attention and recon stages,
    model_search.py:585-589) — regression: a single shared draw."""
    model = NASVideoSR(TINY)
    params = model.init(jax.random.PRNGKey(0))
    arch = model.init_arch()
    clips = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 3, 8, 8))

    calls = []
    real = NASVideoSR.sample_ratio

    def spy(self, a, key, mode="arch_ratio"):
        calls.append(np.asarray(key))
        return real(self, a, key, mode)

    monkeypatch.setattr(NASVideoSR, "sample_ratio", spy)
    model.apply(params, arch, clips, jax.random.PRNGKey(2))
    assert len(calls) == 2, "expected one width draw per conv stage"
    assert not np.array_equal(calls[0], calls[1]), \
        "pre/recon stages reused the same PRNG key (correlated widths)"


def test_search_smoke_deterministic_genotype():
    """A short alternating search run twice with the same seed must produce
    identical genotypes and a decreasing weight loss."""
    import optax
    from gpnf_tpu.models.nas import NASVideoSR

    def run():
        model = NASVideoSR(TINY)
        k = jax.random.PRNGKey(0)
        params = model.init(k)
        arch = model.init_arch()
        feat = PerceptualFeatures()
        opt_w, opt_a = optax.adam(1e-3), optax.adam(5e-3)
        st_w, st_a = opt_w.init(params), opt_a.init(arch)

        def crit(p, a, clips, hr, rng):
            return model.criterion_image(model.apply(p, a, clips, rng), hr,
                                         feature_fn=feat)

        @jax.jit
        def w_step(p, a, st, clips, hr, rng):
            l, g = jax.value_and_grad(crit)(p, a, clips, hr, rng)
            u, st = opt_w.update(g, st, p)
            return optax.apply_updates(p, u), st, l

        @jax.jit
        def a_step(p, a, st, clips, hr, rng):
            l, g = jax.value_and_grad(crit, argnums=1)(p, a, clips, hr, rng)
            u, st = opt_a.update(g, st, a)
            return optax.apply_updates(a, u), st, l

        kd = jax.random.PRNGKey(1)
        losses = []
        for i in range(4):
            kd, k1, kr1, kr2 = jax.random.split(kd, 4)
            clips = jax.random.uniform(k1, (1, 3, 3, 8, 8))
            hr = jax.image.resize(clips[:, 1], (1, 3, 128, 128),
                                  method="cubic")
            params, st_w, lw = w_step(params, arch, st_w, clips, hr, kr1)
            arch, st_a, _ = a_step(params, arch, st_a, clips, hr, kr2)
            losses.append(float(lw))
        return genotype(arch), losses

    g1, l1 = run()
    g2, l2 = run()
    assert g1 == g2, "search not deterministic under fixed seed"
    assert l1 == l2
    assert l1[-1] < l1[0], l1


def test_derived_network_matches_saturated_supernet():
    """derive() + derive_params(): the discretized single-op network must
    reproduce the supernet's forward when the supernet's arch params are
    saturated one-hots at the genotype (widths forced to 1.0) — the AGD
    retrain-stage network (`operations_infer.py` surface)."""
    from gpnf_tpu.models.nas import derive_params

    model = NASVideoSR(TINY)
    params = model.init(jax.random.PRNGKey(0))
    arch = model.init_arch()

    # saturate every arch tensor at its (argmax-of-init == index 0) choice,
    # except pick distinct ops per slot to exercise the transplant indexing
    n_ops, n_attn = len(PRIMITIVES), len(PRIMITIVES_ATTN)
    n_w = len(NASConfig.width_mults)
    sel_ops = jnp.arange(TINY.num_cell * TINY.op_per_cell).reshape(
        TINY.num_cell, TINY.op_per_cell) % n_ops
    arch = {
        "alpha": 50.0 * jax.nn.one_hot(sel_ops, n_ops),
        "beta": 50.0 * jax.nn.one_hot(
            jnp.zeros((TINY.num_cell, TINY.op_per_cell), jnp.int32), 2),
        "ratio": 50.0 * jax.nn.one_hot(
            jnp.full((TINY.num_cell, TINY.op_per_cell - 1), n_w - 1,
                     jnp.int32), n_w),
        "alpha_att_levels": 50.0 * jax.nn.one_hot(
            jnp.ones((TINY.num_cell_attn, TINY.op_per_cell_attn, n_attn),
                     jnp.int32), n_attn),
        "alpha_sink": 50.0 * jax.nn.one_hot(
            jnp.zeros((TINY.num_cell_attn, TINY.op_per_cell_attn),
                      jnp.int32), 2 * n_attn),
        "alpha_activations": 50.0 * jax.nn.one_hot(
            jnp.ones((TINY.num_cell_attn, TINY.op_per_cell_attn, 2 * n_attn),
                     jnp.int32), 3),
    }
    geno = genotype(arch)
    assert geno["widths"] == [[1.0]] * TINY.num_cell

    clips = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 3, 8, 8))
    want = model.apply(params, arch, clips, prun_mode="max")

    derived = model.derive(geno)
    d_params = derive_params(params, geno)
    got = derived.apply(d_params, clips)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # fresh init + gradient flow for the retrain stage
    p2 = derived.init(jax.random.PRNGKey(5))
    g = jax.grad(lambda p: jnp.sum(derived.apply(p, clips) ** 2))(p2)
    assert any(jnp.any(x != 0) for x in jax.tree_util.tree_leaves(g))
