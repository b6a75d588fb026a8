"""EMA shadow weights (beyond-reference: the ESRGAN lineage ships EMA'd
generators). The shadow is initialized at the params, blended inside the
fused train step, served via generate(ema=True), and saved as
'*_best_ema'."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplesr_tpu.train import Generator, SRModel, load_model


def _tiny_model(tmp_path, ema_decay=None, ema_eval=False):
    gen = Generator.srresnet(upsample_factor=2, num_blocks=1, num_filters=8,
                             batch_norm=False, dtype=jnp.float32,
                             input_dims=(16, 16))

    class Cfg:
        model_dir = str(tmp_path / "models")
        checkpoint_dir = str(tmp_path / "checkpoints")
        early_stop_metric = "psnr"
        early_stop_patience = 100
        epoch_train_summary_writer = None
        batch_train_summary_writer = None
        epoch_validation_summary_writer = None
        batch_validation_summary_writer = None

    return SRModel(model_type="resnet", generator=gen,
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": 1e-3},
                   config=Cfg, ema_decay=ema_decay, ema_eval=ema_eval)


def _batch(rng, n=2, hw=16, scale=2):
    lr = rng.uniform(0, 1, size=(n, hw, hw, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, size=(n, hw * scale, hw * scale, 3)).astype(np.float32)
    return lr, hr


def test_ema_matches_manual_recurrence(tmp_path, rng):
    d = 0.5
    model = _tiny_model(tmp_path, ema_decay=d)
    expect = jax.device_get(model.state.g_params)  # EMA starts AT params
    for _ in range(3):
        model.train_step(*_batch(rng))
        p = jax.device_get(model.state.g_params)
        expect = jax.tree_util.tree_map(
            lambda e, q: d * e + (1 - d) * q, expect, p)
    got = jax.device_get(model.state.g_ema_params)
    for e, g in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-7)
    # the shadow must lag the raw params (they moved; decay 0.5 averages)
    raw = jax.device_get(model.state.g_params)
    diffs = [np.abs(a - b).max() for a, b in
             zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(raw))]
    assert max(diffs) > 0


def test_ema_off_is_empty_and_rejected(tmp_path, rng):
    model = _tiny_model(tmp_path, ema_decay=None)
    model.train_step(*_batch(rng))
    assert model.state.g_ema_params == {}
    with pytest.raises(ValueError):
        model.generate(np.zeros((1, 8, 8, 3), np.float32), ema=True)
    with pytest.raises(ValueError):
        _tiny_model(tmp_path, ema_decay=1.5)


def test_ema_generate_and_saved_model(tmp_path, rng):
    model = _tiny_model(tmp_path, ema_decay=0.9)
    for _ in range(2):
        model.train_step(*_batch(rng))
    lr = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    out_raw = np.asarray(model.generate(lr))
    out_ema = np.asarray(model.generate(lr, ema=True))
    assert not np.allclose(out_raw, out_ema)

    path = model.save_model(str(tmp_path / "out"), postfix="x", ema=True)
    module, variables = load_model(path)
    ema_params = jax.device_get(model.state.g_ema_params)
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(ema_params)):
        np.testing.assert_array_equal(a, b)


def test_after_training_writes_best_ema(tmp_path, rng):
    model = _tiny_model(tmp_path, ema_decay=0.99)
    model.before_epoch()
    model.train_step(*_batch(rng))
    model.after_epoch()
    model.after_training()
    import os
    files = os.listdir(model._model_dir)
    assert any("best_ema" in f for f in files), files
    assert any(f.endswith("best.msgpack") for f in files), files


def test_checkpoint_roundtrip_preserves_ema(tmp_path, rng):
    model = _tiny_model(tmp_path, ema_decay=0.8)
    model.before_epoch()
    for _ in range(2):
        model.train_step(*_batch(rng))
    model.after_epoch()  # saves a checkpoint (new best)
    want = jax.device_get(model.state.g_ema_params)
    model.train_step(*_batch(rng))  # diverge past the checkpoint
    model._restore_latest_checkpoint()
    got = jax.device_get(model.state.g_ema_params)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(a, b)


def test_ema_eval_validates_on_the_shadow(tmp_path, rng):
    """ema_eval=True: the validation metrics (hence early stop / best
    checkpoint selection) come from the EMA shadow, not the raw params —
    proven by corrupting the shadow and watching validation react."""
    model = _tiny_model(tmp_path / "a", ema_decay=0.9, ema_eval=True)
    raw_model = _tiny_model(tmp_path / "b", ema_decay=0.9, ema_eval=False)
    lr, hr = _batch(rng)

    def valid_psnr(m):
        m.before_epoch()
        m.validation_step(lr, hr)
        return float(m._valid_epoch_metrics.ensure("psnr").result())

    # identical seeds + EMA==params at init → identical validation
    assert valid_psnr(model) == pytest.approx(valid_psnr(raw_model), rel=1e-6)

    # corrupt the shadow: ema_eval model must react, raw model must not
    for m in (model, raw_model):
        m.set_state(m.state.replace(g_ema_params=jax.tree_util.tree_map(
            lambda x: x * 5.0 + 1.0, m.state.g_ema_params)))
    base = valid_psnr(raw_model)
    assert valid_psnr(raw_model) == pytest.approx(base, rel=1e-6)
    assert valid_psnr(model) != pytest.approx(base, rel=1e-3)


def test_ema_eval_requires_ema_decay(tmp_path):
    with pytest.raises(ValueError):
        _tiny_model(tmp_path, ema_decay=None, ema_eval=True)
