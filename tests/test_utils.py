"""Fast tests for infra: options, metrics, imresize, checkpoints, data
transforms, LR schedules, attention variants round trips."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def test_opt_get_and_nonedict():
    from gpnf_tpu.utils.options import NoneDict, dict_to_nonedict, opt_get

    opt = dict_to_nonedict({"a": {"b": {"c": 3}}, "x": None})
    assert opt_get(opt, ["a", "b", "c"]) == 3
    assert opt_get(opt, ["a", "missing", "c"], 7) == 7
    assert opt_get(opt, ["x"], "dflt") == "dflt"
    assert opt["missing_key"] is None
    assert opt["a"]["nope"] is None


def test_parse_options_yaml(tmp_path):
    from gpnf_tpu.utils.options import parse_options

    cfg = tmp_path / "c.yml"
    cfg.write_text("""
name: t
scale: 4
datasets:
  train: {batch_size: 2}
train:
  niter: 1000
  lr_steps_rel: [0.5, 0.9]
path:
  root: %s
""" % tmp_path)
    opt = parse_options(str(cfg))
    assert opt["train"]["lr_steps"] == [500, 900]
    assert opt["datasets"]["train"]["scale"] == 4
    assert "models" in opt["path"]["models"]


def test_psnr_ssim_basics():
    from gpnf_tpu.utils.metrics import psnr, ssim

    a = np.random.default_rng(0).uniform(0, 255, (32, 32, 3))
    assert psnr(a, a) == float("inf")
    assert ssim(a, a) == pytest.approx(1.0)
    assert psnr(a, np.clip(a + 10, 0, 255)) < 30


def test_imresize_matlab_properties():
    from gpnf_tpu.utils.imresize import imresize

    img = np.tile(np.linspace(0, 255, 64)[:, None, None], (1, 64, 3))
    d = imresize(img, 0.25)
    assert d.shape == (16, 16, 3)
    # downscaling a constant image stays constant
    const = np.full((32, 32, 3), 100.0)
    np.testing.assert_allclose(imresize(const, 0.5), 100.0, atol=1e-9)
    # antialiased downscale of a linear ramp stays a ramp (interior)
    mid = imresize(img, 0.5)
    diffs = np.diff(mid[2:-2, 5, 0])
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-6)


def test_checkpoint_manager(tmp_path):
    from gpnf_tpu.training.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), keep=2, keep_every=100)
    state = {"params": {"w": jnp.ones((2, 2)), "list": [jnp.zeros(3)]},
             "step": jnp.asarray(0)}
    assert mgr.save(1, state, metric=5.0)  # first -> best
    assert not mgr.save(2, state, metric=6.0)
    assert mgr.save(100, state, metric=4.0)
    mgr.save(101, state)
    assert mgr.latest_step() == 101
    # keep=2 newest (100, 101) and 100 is also a keep_every multiple; 1,2 gone
    assert set(mgr._steps()) == {100, 101}

    restored = mgr.restore(state)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 1.0)
    best = mgr.restore(state, best=True)
    assert best["params"]["list"][0].shape == (3,)


def test_data_transforms():
    from gpnf_tpu.data.transforms import mnist_glow_pad, shift_augment, random_flip

    imgs = np.random.default_rng(0).integers(0, 255, (4, 28, 28), dtype=np.uint8)
    out = mnist_glow_pad(imgs)
    assert out.shape == (4, 3, 32, 32)
    np.testing.assert_array_equal(out[:, 0], out[:, 2])  # tiled channels
    np.testing.assert_array_equal(out[0, 0, 2:30, 2:30], imgs[0])

    rng = np.random.default_rng(1)
    batch = np.random.default_rng(2).integers(0, 255, (4, 3, 32, 32), dtype=np.uint8)
    shifted = shift_augment(rng, batch)
    assert shifted.shape == batch.shape
    flipped = random_flip(rng, batch)
    assert flipped.shape == batch.shape


def test_synthetic_dataset_loader():
    from gpnf_tpu.data import get_dataset

    train, test, shape = get_dataset("synthetic", 8)
    assert shape == (32, 32, 3)
    b = next(iter(train))
    assert b.shape == (8, 3, 32, 32)
    assert b.min() >= -0.5 and b.max() <= 0.5


def test_lrhr_dataset():
    from gpnf_tpu.data.lrhr import LRHRConfig, LRHRDataset, synthetic_lrhr

    hr = synthetic_lrhr(n=6, hr_size=32, scale=4)
    ds = LRHRDataset(LRHRConfig(crop_size=16, scale=4), hr_images=hr)
    lr_b, hr_b = next(iter(ds.batches(2)))
    assert lr_b.shape == (2, 3, 4, 4)
    assert hr_b.shape == (2, 3, 16, 16)
    assert 0.0 <= lr_b.min() and hr_b.max() <= 1.0


def test_schedules():
    from gpnf_tpu.training.schedules import (cosine_restart, linear_warmup,
                                             multistep_restart)

    w = linear_warmup(100)
    assert float(w(50)) == pytest.approx(0.5)
    assert float(w(200)) == 1.0

    ms = multistep_restart([10, 20], gamma=0.5, restarts=[30], restart_weights=[1.0])
    assert float(ms(5)) == 1.0
    assert float(ms(15)) == 0.5
    assert float(ms(25)) == 0.25

    cs = cosine_restart([100, 100], restart_weights=[1.0, 0.5])
    assert float(cs(0)) == pytest.approx(1.0)
    assert float(cs(100)) == pytest.approx(0.5)  # restart at half weight


def test_spatial_attention_roundtrip():
    from gpnf_tpu.ops.attention_variants import SpatialFirstOrderAttention

    at = SpatialFirstOrderAttention(4)
    params = at.init(KEY)
    x = jax.random.normal(KEY, (2, 4, 4, 4))
    for permute in (False, True):
        y, ld = at.forward(params, x, jnp.zeros((2,)), permute=permute)
        x2, ld2 = at.inverse(params, y, ld, permute=permute)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-4)


def test_elementwise_attention_roundtrip():
    from gpnf_tpu.ops.attention_variants import ElementwiseChannelAttention

    at = ElementwiseChannelAttention(4, (4, 6, 6), mask_key=jax.random.PRNGKey(7))
    params = at.init(KEY)
    x = jax.random.normal(KEY, (2, 4, 6, 6))
    y, ld = at.forward(params, x, jnp.zeros((2,)))
    x2, ld2 = at.inverse(params, y, ld)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld2), 0.0, atol=1e-4)


def test_losses():
    from gpnf_tpu.training.losses import charbonnier_loss, gan_loss, l1_loss

    a = jnp.ones((2, 3, 4, 4))
    b = jnp.zeros((2, 3, 4, 4))
    assert float(l1_loss(a, b)) == pytest.approx(1.0)
    assert float(charbonnier_loss(a, b)) == pytest.approx(1.0, abs=1e-3)
    logits = jnp.zeros((4,))
    assert float(gan_loss("lsgan", logits, True)) == pytest.approx(1.0)
    assert float(gan_loss("gan", logits, True)) == pytest.approx(np.log(2), abs=1e-5)


def test_random_feature_fid():
    """FID machinery with the in-env random-CNN embedder: near-zero on
    identical sets, ordered by distribution shift, deterministic."""
    import numpy as np

    from gpnf_tpu.utils.fid import RandomFeatureEmbedder, fid_between

    rng = np.random.default_rng(0)
    real = rng.uniform(0, 1, (48, 3, 16, 16)).astype(np.float32)
    close = np.clip(real + rng.normal(0, 0.02, real.shape), 0, 1).astype(np.float32)
    far = np.clip(real * 0.3 + 0.6, 0, 1).astype(np.float32)

    emb = RandomFeatureEmbedder(seed=0)
    f_same = fid_between(emb, [real], [real.copy()])
    f_close = fid_between(emb, [real], [close])
    f_far = fid_between(emb, [real], [far])
    assert f_same < 1e-4
    assert f_same < f_close < f_far

    emb2 = RandomFeatureEmbedder(seed=0)
    np.testing.assert_allclose(emb(real[:4]), emb2(real[:4]), rtol=1e-6)


def test_lpips_rf_substitute():
    import numpy as np

    from gpnf_tpu.utils.metrics import Measure, lpips_rf

    rng = np.random.default_rng(1)
    a = rng.uniform(0, 255, (32, 32, 3))
    near = np.clip(a + rng.normal(0, 2, a.shape), 0, 255)
    far = np.clip(255 - a, 0, 255)
    d_same = lpips_rf(a, a)
    d_near = lpips_rf(a, near)
    d_far = lpips_rf(a, far)
    assert d_same < 1e-8 and d_same < d_near < d_far

    _, _, lp = Measure(lpips_substitute=True).measure(a, near)
    assert lp is not None and np.isfinite(lp)


def test_checkpoint_manager_async_save(tmp_path):
    """save_async writes the same artifact as save, including best tracking,
    and wait_async surfaces worker errors."""
    import jax.numpy as jnp

    from gpnf_tpu.training.checkpoints import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path))
    state = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    ckpt.save_async(1, state, metric=5.0)
    ckpt.save_async(2, state, metric=3.0)  # joins the first save
    ckpt.wait_async()
    assert ckpt.latest_step() == 2
    got = ckpt.restore({"w": jnp.zeros((2, 3)), "b": jnp.zeros((3,))},
                       best=True)
    np.testing.assert_allclose(np.asarray(got["w"]), np.asarray(state["w"]))
    meta = ckpt._load_meta()
    assert meta["best_step"] == 2 and meta["best_metric"] == 3.0


def test_lpips_proxy_trained_features():
    """Trained-feature perceptual proxy (utils/perceptual.py): deterministic
    across calls, zero for identical inputs, monotone in corruption level,
    and wired through Measure(lpips_proxy=True)."""
    from gpnf_tpu.utils.metrics import Measure
    from gpnf_tpu.utils.perceptual import lpips_proxy

    rng = np.random.default_rng(0)
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    noisy_sm = np.clip(img + rng.normal(0, 8, img.shape), 0, 255)
    noisy_lg = np.clip(img + rng.normal(0, 40, img.shape), 0, 255)

    assert lpips_proxy(img, img) == 0.0
    d1, d1b = lpips_proxy(img, noisy_sm), lpips_proxy(img, noisy_sm)
    assert d1 == d1b, "proxy not deterministic"
    d2 = lpips_proxy(img, noisy_lg)
    assert 0 < d1 < d2, (d1, d2)

    _, _, lp = Measure(lpips_proxy=True).measure(img, noisy_sm)
    assert lp is not None and abs(lp - d1) < 1e-6


def test_prefetch_loader_matches_inner():
    """PrefetchLoader must yield exactly the inner loader's batches, in
    order, across multiple epochs, and propagate worker exceptions."""
    import numpy as np
    import pytest

    from gpnf_tpu.data.datasets import NumpyLoader, PrefetchLoader

    imgs = (np.arange(8 * 3 * 4 * 4) % 255).astype(np.uint8).reshape(8, 3, 4, 4)
    inner = NumpyLoader(imgs, 2, shuffle=False)
    pre = PrefetchLoader(NumpyLoader(imgs, 2, shuffle=False), depth=2,
                         to_device=False)
    assert len(pre) == len(inner)
    for _ in range(2):  # fresh epoch per __iter__
        got = list(pre)
        want = list(inner)
        assert len(got) == len(want)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    class Boom:
        def __iter__(self):
            yield np.zeros((2, 3, 4, 4), np.float32)
            raise ValueError("worker boom")

    with pytest.raises(ValueError, match="worker boom"):
        list(PrefetchLoader(Boom(), to_device=False))


def test_prefetch_loader_abandoned_iteration_reaps_worker():
    """Dropping the generator mid-epoch (e.g. a max_steps break) must stop
    the worker thread instead of leaking it blocked on q.put (ADVICE r4)."""
    import threading
    import time

    import numpy as np

    from gpnf_tpu.data.datasets import NumpyLoader, PrefetchLoader

    imgs = np.zeros((64, 3, 4, 4), np.uint8)  # 32 batches >> depth
    pre = PrefetchLoader(NumpyLoader(imgs, 2, shuffle=False), depth=2,
                         to_device=False)
    before = {t.ident for t in threading.enumerate()}
    it = iter(pre)
    next(it)
    it.close()  # GeneratorExit — the abandonment path
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.ident not in before and t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"prefetch worker leaked: {leaked}"


def test_prefetch_loader_device_put():
    from gpnf_tpu.data.datasets import NumpyLoader, PrefetchLoader
    import numpy as np
    import jax

    imgs = np.zeros((4, 3, 4, 4), np.uint8)
    pre = PrefetchLoader(NumpyLoader(imgs, 2, shuffle=False), to_device=True)
    batches = list(pre)
    assert len(batches) == 2
    assert all(isinstance(b, jax.Array) for b in batches)
