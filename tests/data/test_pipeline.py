"""DataPipeline invariants, mirroring reference
tests/data_pipeline/test_data_pipeline.py: output cardinality
N × split × num_crops × (1+len(augs)), batch shapes, train/val disjointness,
and the LR↔HR correspondence property (bicubic-downscaled HR ≡ LR)."""

import numpy as np
import pytest
import jax.numpy as jnp

from simplesr_tpu.data import DataPipeline
from simplesr_tpu.ops import resize, ssim, psnr

NOISE_DIR = "/root/reference/tests/data/patterns/random_noise"
GRAD_DIR = "/root/reference/tests/data/patterns/gradients"


def _pipeline(**kw):
    args = dict(
        hr_img_path=NOISE_DIR, scale=2, train_val_split=0.25, batch_size=4,
        crop=True, crop_size=(32, 32, 3), num_crops=2, random_seed=7,
    )
    args.update(kw)
    return DataPipeline(**args)


def test_split_counts_and_disjoint():
    p = _pipeline()
    assert len(p.train_imgs) == 6 and len(p.val_imgs) == 2
    assert not (set(p.train_imgs) & set(p.val_imgs))


def test_train_output_cardinality():
    augs = ["flip_along_x", "flip_along_y"]
    p = _pipeline(augmentations=augs)
    total = sum(int(lr.shape[0]) for lr, hr in p.train_batch_generator())
    # 6 train imgs × 2 crops × (1 + 2 augs)
    assert total == 6 * 2 * (1 + len(augs))


def test_batch_shapes():
    p = _pipeline()
    for lr, hr in p.train_batch_generator():
        assert hr.shape[1:] == (32, 32, 3)
        assert lr.shape[1:] == (16, 16, 3)
        assert hr.shape[0] == lr.shape[0] <= 4
        assert float(jnp.max(hr)) <= 1.0 + 1e-6 and float(jnp.min(hr)) >= -1.0 - 1e-6
        assert float(jnp.min(lr)) >= 0.0 and float(jnp.max(lr)) <= 1.0


def test_lr_hr_correspondence():
    """The core dataset invariant (reference test :147-158): downscaling the
    HR by the pipeline scale must reproduce LR (SSIM≈1, PSNR→∞)."""
    p = _pipeline()
    for lr, hr in p.train_batch_generator():
        hr01 = (hr + 1.0) / 2.0
        relr = resize(hr01, (16, 16), method="bicubic", antialias=True)
        assert float(jnp.mean(ssim(relr, lr, max_val=1.0))) > 0.999
        assert float(jnp.mean(psnr(relr, lr, max_val=1.0))) > 50.0


def test_lr_hr_correspondence_diverse_crop():
    p = _pipeline(crop_naive=False, minimum_variation_patch=0.01,
                  minimum_variation_batch=0.0)
    batches = list(p.train_batch_generator())
    assert batches
    lr, hr = batches[0]
    relr = resize((hr + 1.0) / 2.0, (16, 16), method="bicubic", antialias=True)
    assert float(jnp.mean(ssim(relr, lr, max_val=1.0))) > 0.999


def test_validation_no_augmentation_no_shuffle():
    p = _pipeline(augmentations=["flip_along_x"])
    v1 = [np.asarray(hr) for _, hr in p.validation_batch_generator()]
    total = sum(b.shape[0] for b in v1)
    assert total == 2 * 2  # 2 val imgs × 2 crops, no augmentation fan-out


def test_jpg_noise_degrades_lr():
    p_clean = _pipeline(random_seed=3)
    p_noisy = _pipeline(random_seed=3, jpg_noise=True, jpg_noise_level=60)
    lr_c, hr_c = next(iter(p_clean.train_batch_generator()))
    lr_n, hr_n = next(iter(p_noisy.train_batch_generator()))
    np.testing.assert_allclose(np.asarray(hr_c), np.asarray(hr_n), atol=1e-6)
    assert not np.allclose(np.asarray(lr_c), np.asarray(lr_n), atol=1e-3)


def test_jpg_noise_randomized_quality_range():
    """jpg_noise_level=(lo, hi) degrades each crop at its own random
    quality: HR stream unchanged, LR noisier than clean, and two crops of
    the same batch see different quantization (their deviation from the
    clean LR differs in magnitude)."""
    p_clean = _pipeline(random_seed=3)
    p_rand = _pipeline(random_seed=3, jpg_noise=True,
                       jpg_noise_level=(10, 70))
    lr_c, hr_c = next(iter(p_clean.train_batch_generator()))
    lr_r, hr_r = next(iter(p_rand.train_batch_generator()))
    np.testing.assert_allclose(np.asarray(hr_c), np.asarray(hr_r), atol=1e-6)
    dev = np.abs(np.asarray(lr_r) - np.asarray(lr_c)).mean(axis=(1, 2, 3))
    assert (dev > 1e-4).all()  # every crop degraded
    # the airtight per-crop check: identical crops through the fused prep —
    # with a quality RANGE the outputs must differ crop-to-crop (same input,
    # different quantization), with a fixed level they must be identical
    import jax

    hr_same = jnp.tile(hr_c[:1] * 127.5 + 127.5, (4, 1, 1, 1))
    aug_ids = jnp.zeros((4,), jnp.int32)
    key = jax.random.key(7)
    lr_fix, _ = p_clean._prepare_batch_fn(4, 32, 32)(hr_same, aug_ids, key)
    prep_rand = p_rand._prepare_batch_fn(4, 32, 32)
    lr_rand, _ = prep_rand(hr_same, aug_ids, key)
    a = np.asarray(lr_rand)
    assert np.allclose(np.asarray(lr_fix)[0], np.asarray(lr_fix)[1])
    assert not np.allclose(a[0], a[1], atol=1e-5) or \
        not np.allclose(a[0], a[2], atol=1e-5)
    # and the draw is key-deterministic
    b = np.asarray(prep_rand(hr_same, aug_ids, key)[0])
    np.testing.assert_array_equal(a, b)


def test_jpg_noise_level_range_validation():
    with pytest.raises(ValueError):
        _pipeline(jpg_noise=True, jpg_noise_level=(70, 10))
    with pytest.raises(ValueError):
        _pipeline(jpg_noise=True, jpg_noise_level=(0, 100))


def test_explicit_validation_path():
    p = _pipeline(validationset_path=GRAD_DIR, train_val_split=0.5)
    assert len(p.train_imgs) == 8  # no split when explicit val path given
    assert len(p.val_imgs) == 8


def test_test_generator_yields_paths():
    p = DataPipeline(hr_img_path=None, scale=2, test_img_paths=[NOISE_DIR])
    batches = list(p.test_batch_generator(batch_size=4))
    n = sum(b.shape[0] for b, _ in batches)
    assert n == 8
    for imgs, paths in batches:
        assert imgs.shape[0] == len(paths)
        assert float(jnp.max(imgs)) <= 1.0


def test_inference_pipeline_factory():
    class Cfg:
        test_data_paths = [NOISE_DIR]
        antialias = True
        scale = 4
    p = DataPipeline.inference_pipeline(Cfg)
    assert len(list(p.test_batch_generator(2))) == 4


def test_deterministic_split_with_seed():
    a = _pipeline(random_seed=11)
    b = _pipeline(random_seed=11)
    assert a.train_imgs == b.train_imgs and a.val_imgs == b.val_imgs


def test_hetero_whole_image_training(tmp_path):
    """crop=False with mixed image sizes: the pipeline falls back to
    per-image batches (reference trains on whole images when
    crop_imgs: false, data_pipeline.py:190) and they must flow through a
    real train_step end to end."""
    from PIL import Image
    from simplesr_tpu.train import Generator, SRModel

    d = tmp_path / "imgs"; d.mkdir()
    rng = np.random.default_rng(0)
    for i, (h, w) in enumerate([(24, 32), (32, 24), (24, 32)]):
        arr = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")

    pipe = DataPipeline(hr_img_path=str(d), scale=2, train_val_split=0.0,
                        batch_size=2, crop=False, random_seed=0)

    class Cfg:
        model_dir = str(tmp_path / "m"); checkpoint_dir = str(tmp_path / "c")
        early_stop_metric = "psnr"; early_stop_patience = 10
        epoch_train_summary_writer = None; batch_train_summary_writer = None
        epoch_validation_summary_writer = None; batch_validation_summary_writer = None

    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             batch_norm=False, dtype=jnp.float32,
                             input_dims=(12, 16))
    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-3},
                    config=Cfg)
    model.before_epoch()
    shapes = set()
    n_imgs = 0
    for lr, hr in pipe.train_batch_generator():
        # a size-mixed chunk falls back to per-image batches; same-shape
        # images may still batch together — never mixed shapes in one batch
        assert hr.shape[1] == lr.shape[1] * 2 and hr.shape[2] == lr.shape[2] * 2
        shapes.add(tuple(lr.shape[1:3]))
        model.train_step(lr, hr)
        model.after_train_batch()
        n_imgs += lr.shape[0]
    assert n_imgs == 3 and shapes == {(12, 16), (16, 12)}
    loss = model.generator_wrapper().epoch_metrics(train=True)["generator_loss"].result()
    assert np.isfinite(loss)


def test_worker_count_invariance():
    """The multi-worker host assembly must produce batches identical to the
    single-worker pipeline for the same seed (per-file RNG streams make the
    crop draws scheduling-independent)."""
    augs = ["flip_along_x"]
    a = _pipeline(augmentations=augs, num_workers=1, device_resident=False)
    b = _pipeline(augmentations=augs, num_workers=4, device_resident=False)
    batches_a = [(np.asarray(lr), np.asarray(hr))
                 for lr, hr in a.train_batch_generator()]
    batches_b = [(np.asarray(lr), np.asarray(hr))
                 for lr, hr in b.train_batch_generator()]
    assert len(batches_a) == len(batches_b) > 0
    for (lr_a, hr_a), (lr_b, hr_b) in zip(batches_a, batches_b):
        np.testing.assert_array_equal(lr_a, lr_b)
        np.testing.assert_array_equal(hr_a, hr_b)


def test_device_pool_matches_host_path():
    """The device-resident crop pool (images uploaded once, crops gathered
    on device, one jitted call per batch) must produce batches bit-identical
    to the host assembly path for the same seed — the per-file RNG streams
    draw the same crop windows either way."""
    augs = ["flip_along_x", "rotate90"]
    pooled = _pipeline(augmentations=augs, device_resident=True)
    host = _pipeline(augmentations=augs, device_resident=False)
    got = [(np.asarray(lr), np.asarray(hr))
           for lr, hr in pooled.train_batch_generator()]
    want = [(np.asarray(lr), np.asarray(hr))
            for lr, hr in host.train_batch_generator()]
    assert len(got) == len(want) > 0
    for (lr_a, hr_a), (lr_b, hr_b) in zip(got, want):
        np.testing.assert_array_equal(lr_a, lr_b)
        np.testing.assert_array_equal(hr_a, hr_b)


def test_device_pool_auto_gating():
    """auto enables the pool only when crops + images fit the budget; naive
    cropping is required (diversity sampling ranks on host)."""
    p = _pipeline()
    assert p._pooled_mode(p.train_imgs)            # tiny fixtures fit 1 GiB
    tight = _pipeline(device_pool_budget=1024)
    assert not tight._pooled_mode(tight.train_imgs)
    diverse = _pipeline(crop_naive=False)
    assert not diverse._pooled_mode(diverse.train_imgs)
    off = _pipeline(device_resident=False)
    assert not off._pooled_mode(off.train_imgs)


def test_device_pool_jpg_noise_matches_host_path():
    """jpg_noise runs inside the same fused prep either way."""
    pooled = _pipeline(jpg_noise=True, jpg_noise_level=40,
                       device_resident=True)
    host = _pipeline(jpg_noise=True, jpg_noise_level=40,
                     device_resident=False)
    got = [np.asarray(lr) for lr, _ in pooled.train_batch_generator()]
    want = [np.asarray(lr) for lr, _ in host.train_batch_generator()]
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_uint8_host_carrier():
    """Host-side decode cache and crop bank are uint8 (the 1-byte/channel
    device transfer carrier); device batches still come out normalized
    float32."""
    p = _pipeline()
    path = p.train_imgs[0]
    assert p._decoded(path).dtype == np.uint8
    crops = p._host_crops(path, np.random.default_rng(0))
    assert all(c.dtype == np.uint8 for c in crops)
    lr, hr = next(iter(p.train_batch_generator()))
    assert lr.dtype == jnp.float32 and hr.dtype == jnp.float32
