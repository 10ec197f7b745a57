"""Native C++ augmentation kernel vs the numpy reference."""
import numpy as np
import pytest

from gpnf_tpu.data import native
from gpnf_tpu.data.datasets import _numpy_shift_flip


@pytest.mark.skipif(not native.available(), reason="no g++ toolchain")
def test_native_matches_numpy():
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (8, 3, 32, 32), dtype=np.uint8)
    shifts = rng.integers(0, 6, 8).astype(np.int32)
    horiz = (rng.random(8) < 0.5).astype(np.uint8)
    flip = (rng.random(8) < 0.5).astype(np.uint8)

    got = native.shift_flip_augment(batch, 3, shifts, horiz, flip)
    want = _numpy_shift_flip(batch, 3, shifts, horiz, flip)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="no g++ toolchain")
def test_native_float_conversion():
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 256, (4, 3, 8, 8), dtype=np.uint8)
    got = native.u8_to_centered_f32(batch)
    want = batch.astype(np.float32) / 255.0 - 0.5
    np.testing.assert_allclose(got, want, atol=1e-7)
    assert got.dtype == np.float32


def test_fid_machinery():
    from gpnf_tpu.utils.fid import (fid_between, frechet_distance,
                                    gaussian_stats, pixel_embed)

    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, (256, 8))
    mu, sig = gaussian_stats(a)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)
    # shifted distribution has distance ~ ||shift||^2
    b = a + 2.0
    mub, sigb = gaussian_stats(b)
    assert frechet_distance(mu, sig, mub, sigb) == pytest.approx(8 * 4.0, rel=0.05)

    imgs_a = rng.integers(0, 255, (64, 3, 16, 16)).astype(np.uint8)
    imgs_b = rng.integers(0, 255, (64, 3, 16, 16)).astype(np.uint8)
    fid_same = fid_between(pixel_embed, [imgs_a], [imgs_a])
    fid_diff = fid_between(pixel_embed, [imgs_a], [imgs_b])
    assert fid_same == pytest.approx(0.0, abs=1e-6)
    assert fid_diff > 0


def test_srflow_model_wrapper():
    """BaseModel-protocol facade drives a tiny SRFlow end to end."""
    import jax

    from gpnf_tpu.models.srflow import SRFlowConfig
    from gpnf_tpu.models.wrappers import SRFlowModel
    from gpnf_tpu.training.srflow_loop import SRTrainConfig

    cfg = SRFlowConfig(scale=4, hr_size=16, K=1, L=1, hidden_channels=8,
                       additional_flow_no_affine=1, use_attention=False,
                       rrdb_nf=8, rrdb_nb=1, rrdb_gc=4, stack_blocks=(),
                       stack_concat=False, split_enable=False)
    tcfg = SRTrainConfig(niter=10, batch_size=2)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        model = SRFlowModel(cfg, tcfg, checkpoint_dir=d)
        rng = np.random.default_rng(0)
        data = {"LQ": rng.random((2, 3, 4, 4)).astype(np.float32),
                "GT": rng.random((2, 3, 16, 16)).astype(np.float32)}
        model.feed_data(data)
        loss = model.optimize_parameters(0)
        assert np.isfinite(loss)
        vis = model.test(heats=(0.5,))
        assert any(k.startswith("SR_h0.50") for k in vis)
        model.save(1, metric=loss)
        model.load(best=True)
        assert model.ckpt.latest_step() == 1
