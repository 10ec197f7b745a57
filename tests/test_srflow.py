"""SRFlow stack tests: RRDB pyramid, conditional coupling round trip,
full encode/decode invertibility (the reference's test_code.py as a real test),
and a short training step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpnf_tpu.models.rrdb import RRDBConfig, RRDBNet
from gpnf_tpu.models.srflow import (CondAffineSeparatedAndCond, NonLUInvConv,
                                    Split2dCond, SRFlowConfig, SRFlowNet)

KEY = jax.random.PRNGKey(0)


def small_cfg(**kw):
    base = dict(scale=4, hr_size=32, K=2, L=2, hidden_channels=16,
                additional_flow_no_affine=1, use_attention=True, attn_heads=2,
                rrdb_nf=16, rrdb_nb=2, rrdb_gc=8, stack_blocks=(0, 1),
                stack_concat=True)
    base.update(kw)
    return SRFlowConfig(**base)


def test_rrdb_pyramid_shapes():
    cfg = RRDBConfig(nf=16, nb=2, gc=8, scale=4, stack_blocks=(0,),
                     fea_up0=True, fea_up_n1=True)
    net = RRDBNet(cfg)
    params = net.init(KEY)
    lr = jax.random.uniform(KEY, (2, 3, 8, 8))
    res = net.apply(params, lr, get_steps=True)
    assert res["last_lr_fea"].shape == (2, 16, 8, 8)
    assert res["fea_up1"].shape == (2, 16, 8, 8)
    assert res["fea_up2"].shape == (2, 16, 16, 16)
    assert res["fea_up4"].shape == (2, 16, 32, 32)
    assert res["fea_up0"].shape == (2, 16, 4, 4)
    assert res["fea_up-1"].shape == (2, 16, 2, 2)
    assert res["block_0"].shape == (2, 16, 8, 8)
    assert res["out"].shape == (2, 3, 32, 32)


def test_nonlu_invconv_roundtrip():
    ic = NonLUInvConv(8)
    params = ic.init(KEY)
    x = jax.random.normal(KEY, (2, 8, 4, 4))
    y, ld = ic.forward(params, x, jnp.zeros((2,)))
    x2, ld2 = ic.inverse(params, y, ld)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-4)
    # orthogonal init -> logdet ~ 0
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-3)


def test_cond_affine_roundtrip():
    ca = CondAffineSeparatedAndCond(8, in_channels_rrdb=6, hidden_channels=8)
    params = ca.init(KEY)
    x = jax.random.normal(KEY, (2, 8, 4, 4))
    ft = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 4, 4))
    y, ld = ca.forward(params, x, jnp.zeros((2,)), ft=ft)
    x2, ld2 = ca.inverse(params, y, ld, ft=ft)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-3)


def test_split2d_cond_eps_roundtrip():
    sp = Split2dCond(8, consume_ratio=0.5)
    params = sp.init(KEY)
    x = jax.random.normal(KEY, (2, 8, 4, 4))
    z1, ld, eps = sp.forward(params, x, jnp.zeros((2,)))
    assert z1.shape == (2, 4, 4, 4)
    x2, ld2 = sp.inverse(params, z1, ld, eps=eps)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-3)


def test_srflow_encode_decode_roundtrip():
    """Full-model invertibility with eps re-injection (test_code.py:19-49)."""
    cfg = small_cfg()
    model = SRFlowNet(cfg)
    params = model.init(KEY)
    hr = jax.random.uniform(KEY, (1, 3, 32, 32))
    lr = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 8, 8))

    lr_enc = model.rrdb_preprocess(params, lr)
    logdet = jnp.zeros((1,))
    z, ld, epses = model.flow.encode(params["flow"], hr, lr_enc, logdet,
                                     collect_eps=True)
    hr_rec, _ = model.flow.decode(params["flow"], z, lr_enc, jnp.zeros((1,)),
                                  epses=epses)
    np.testing.assert_allclose(np.asarray(hr_rec), np.asarray(hr),
                               atol=5e-3, rtol=1e-3)


def test_srflow_nll_and_reverse():
    cfg = small_cfg()
    model = SRFlowNet(cfg)
    params = model.init(KEY)
    hr = jax.random.uniform(KEY, (2, 3, 32, 32))
    lr = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))

    z, nll, logdet = model.forward(params, hr, lr, rng=jax.random.PRNGKey(2))
    assert nll.shape == (2,)
    assert np.all(np.isfinite(np.asarray(nll)))

    sr, _ = model.reverse(params, lr, rng=jax.random.PRNGKey(3), eps_std=0.8)
    assert sr.shape == (2, 3, 32, 32)
    assert np.all(np.isfinite(np.asarray(sr)))


def test_srflow_train_step_runs():
    from gpnf_tpu.data.lrhr import LRHRConfig, LRHRDataset, synthetic_lrhr
    from gpnf_tpu.training.srflow_loop import (SRTrainConfig,
                                               make_srflow_optimizer,
                                               make_srflow_train_step)

    cfg = small_cfg()
    model = SRFlowNet(cfg)
    params = model.init(KEY)

    hr_images = synthetic_lrhr(n=4, hr_size=32, scale=4)
    ds = LRHRDataset(LRHRConfig(crop_size=32, scale=4), hr_images=hr_images)
    lr_img, hr_img = next(iter(ds.batches(2)))

    params = model.ddi(params, jnp.asarray(hr_img), jnp.asarray(lr_img),
                       jax.random.PRNGKey(4))

    tcfg = SRTrainConfig(niter=100, train_rrdb_delay=0.5, batch_size=2)
    opt, mask = make_srflow_optimizer(tcfg, params)
    opt_state = opt.init(params)
    step = make_srflow_train_step(model, tcfg, opt, mask)

    # snapshot before the step: the jitted step donates its input buffers
    w_before = np.asarray(params["rrdb"]["conv_first"]["w"]).copy()
    p1, opt_state, loss1 = step(params, opt_state, jnp.asarray(lr_img),
                                jnp.asarray(hr_img), jax.random.PRNGKey(5),
                                jnp.asarray(0))
    assert np.isfinite(float(loss1))
    # RRDB params must be frozen before the delay elapses
    np.testing.assert_allclose(np.asarray(p1["rrdb"]["conv_first"]["w"]),
                               w_before)


def test_resume_across_optstate_format_change(tmp_path):
    """Resuming from a checkpoint whose optimizer state has a DIFFERENT
    pytree structure (e.g. per-leaf Adam states saved before the
    optax.flatten switch) must fall back to a params-only restore instead
    of crashing (srflow_loop.py auto-resume KeyError fallback)."""
    import optax

    from gpnf_tpu.training.checkpoints import CheckpointManager
    from gpnf_tpu.training.srflow_loop import (SRTrainConfig,
                                               make_srflow_optimizer)

    cfg = small_cfg()
    model = SRFlowNet(cfg)
    params = model.init(KEY)

    # legacy-style state: per-leaf (unflattened) adam moments
    legacy_opt = optax.adam(1e-4)
    legacy_state = legacy_opt.init(params)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(7, {"params": params, "opt_state": legacy_state})

    tcfg = SRTrainConfig(niter=100, batch_size=2)
    opt, _ = make_srflow_optimizer(tcfg, params)
    new_state = opt.init(params)

    # current-format restore must fail (structures differ) ...
    with pytest.raises((KeyError, ValueError)):
        ckpt.restore({"params": params, "opt_state": new_state})
    # ... and the params-only fallback the loop uses must succeed
    restored = ckpt.restore({"params": params})["params"]
    np.testing.assert_allclose(
        np.asarray(restored["rrdb"]["conv_first"]["w"]),
        np.asarray(params["rrdb"]["conv_first"]["w"]))


def test_sr_baseline_loop_reduces_pixel_loss(tmp_path):
    """The plain-SR trainer (models/SR_model.py equivalent, `model: SR`
    dispatch) runs end-to-end and reduces the pixel loss."""
    from gpnf_tpu.data.lrhr import LRHRConfig, LRHRDataset, synthetic_lrhr
    from gpnf_tpu.models.rrdb import RRDBConfig
    from gpnf_tpu.models.sr_baseline import (SRBaselineTrainConfig,
                                             train_sr_baseline)

    hr_images = synthetic_lrhr(n=4, hr_size=32, scale=4)
    ds = LRHRDataset(LRHRConfig(crop_size=32, scale=4), hr_images=hr_images)
    losses = []
    train_sr_baseline(
        RRDBConfig(nf=8, nb=1, gc=8, scale=4),
        SRBaselineTrainConfig(lr=1e-3, niter=200),
        ds, None, batch_size=2, max_steps=200,
        checkpoint_dir=str(tmp_path),
        log_fn=lambda m: losses.append(float(m.rsplit(" ", 1)[-1])))
    assert len(losses) >= 2, "expected loss logs at iters 100 and 200"
    assert losses[-1] < losses[0], losses
    assert (tmp_path / "step_200.npz").exists()


def test_lrhr_kpi_sampling():
    """Dataset KPI sampling (LRHR_PKL_dataset.py:106-129): pair stats are
    recorded and print_and_reset emits + clears them."""
    from gpnf_tpu.data.lrhr import LRHRConfig, LRHRDataset, synthetic_lrhr

    ds = LRHRDataset(LRHRConfig(crop_size=32, scale=4),
                     hr_images=synthetic_lrhr(n=2, hr_size=32, scale=4))
    ds.sample_pair(0)
    assert set(ds.measures) == {"hr_means", "hr_stds", "lr_means", "lr_stds"}
    lines = []
    ds.print_and_reset("train_data", log_fn=lines.append)
    assert lines and lines[0].startswith("[KPI] train_data:")
    assert ds.measures is None


def test_srflow_bf16_compute_close_to_fp32():
    """compute_dtype=bfloat16 (RRDB encoder + coupling hidden convs on the
    MXU in bf16, fp32 heads/logdet — r4 SRFlow perf lever) must track the
    fp32 nll closely and keep grads finite; the remat_save_names="wcast"
    policy must not change values."""
    cfg32 = small_cfg()
    cfg16 = small_cfg(compute_dtype="bfloat16", remat_save_names="wcast")
    m32, m16 = SRFlowNet(cfg32), SRFlowNet(cfg16)
    params = m32.init(KEY)
    hr = jax.random.uniform(KEY, (2, 3, 32, 32))
    lr = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 8))
    k = jax.random.PRNGKey(2)

    _, nll32, _ = m32.forward(params, hr, lr, rng=k)
    _, nll16, _ = m16.forward(params, hr, lr, rng=k)
    assert np.all(np.isfinite(np.asarray(nll16)))
    # bf16 hidden activations shift the conditioning features slightly;
    # bits/px must stay within ~1% of fp32
    np.testing.assert_allclose(np.asarray(nll16), np.asarray(nll32),
                               rtol=0.02, atol=0.05)

    def loss16(p):
        _, nll, _ = m16.forward(p, hr, lr, rng=k, train=True)
        return jnp.mean(nll)

    g = jax.grad(loss16)(params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))

    sr, _ = m16.reverse(params, lr, rng=jax.random.PRNGKey(3), eps_std=0.8)
    assert np.all(np.isfinite(np.asarray(sr)))
