"""Pipeline-parallel TRAINING (SRModel(pipeline_parallel=True)): the fused
step with the generator trunk staged over a 'stage' mesh axis must reproduce
the single-device update on the unchanged state pytree — jax.grad
differentiates through the GPipe scan + ppermute without changing the math."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from simplesr_tpu.train import Generator, SRModel
from simplesr_tpu.parallel import make_mesh, STAGE_AXIS, DATA_AXIS


def _gen(num_blocks=4, nf=8):
    return Generator.srresnet(upsample_factor=2, num_blocks=num_blocks,
                              num_filters=nf, batch_norm=False,
                              dtype=jnp.float32, input_dims=(8, 8))


def _cfg(tmp_path, sub):
    class Cfg:
        model_dir = str(tmp_path / sub / "models")
        checkpoint_dir = str(tmp_path / sub / "checkpoints")
        early_stop_metric = "psnr"
        early_stop_patience = 100
        epoch_train_summary_writer = None
        batch_train_summary_writer = None
        epoch_validation_summary_writer = None
        batch_validation_summary_writer = None
    return Cfg


def _model(tmp_path, sub, mesh=None, pipeline_parallel=False,
           microbatches=None, num_blocks=4):
    # SGD: Adam's normalization amplifies reduction-order noise in tiny
    # gradients (same rationale as tests/parallel/test_tp_training.py)
    return SRModel(model_type="resnet", generator=_gen(num_blocks),
                   generator_optimizer="SGD",
                   generator_optimizer_config={"learning_rate": 1e-2},
                   config=_cfg(tmp_path, sub), mesh=mesh,
                   pipeline_parallel=pipeline_parallel,
                   pipeline_microbatches=microbatches)


def _batch(rng, n=4):
    lr = rng.uniform(0, 1, (n, 8, 8, 3)).astype(np.float32)
    hr = rng.uniform(-1, 1, (n, 16, 16, 3)).astype(np.float32)
    return lr, hr


def _leaves(model):
    return [np.asarray(x) for x in
            jax.tree_util.tree_leaves(jax.device_get(model.state.g_params))]


@pytest.mark.parametrize("microbatches", [2, 4])
def test_pp_training_matches_single_device(rng, tmp_path, microbatches):
    # batch/microbatches must still divide by the data axis (dp×pp shards
    # the microbatch interior)
    lr, hr = _batch(rng, n=8)
    mesh = make_mesh({DATA_AXIS: 2, STAGE_AXIS: 4})
    pp = _model(tmp_path, f"pp_{microbatches}", mesh=mesh,
                pipeline_parallel=True, microbatches=microbatches)
    single = _model(tmp_path, f"sd_{microbatches}")
    for _ in range(2):
        pp.train_step(lr, hr)
        single.train_step(lr, hr)
    for a, b in zip(_leaves(pp), _leaves(single)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_pp_only_mesh_replicates_batch(rng, tmp_path):
    # pure-PP mesh (no data axis): the batch rides replicated; microbatch
    # count defaults to the stage count
    lr, hr = _batch(rng)
    mesh = make_mesh({STAGE_AXIS: 4}, devices=jax.devices()[:4])
    pp = _model(tmp_path, "pponly", mesh=mesh, pipeline_parallel=True)
    single = _model(tmp_path, "sdonly")
    pp.train_step(lr, hr)
    single.train_step(lr, hr)
    for a, b in zip(_leaves(pp), _leaves(single)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_pp_validation_and_generate(rng, tmp_path):
    lr, hr = _batch(rng, n=8)
    mesh = make_mesh({DATA_AXIS: 2, STAGE_AXIS: 4})
    pp = _model(tmp_path, "ppval", mesh=mesh, pipeline_parallel=True)
    pp.before_epoch()
    pp.validation_step(lr, hr)
    val = pp.generator_wrapper().epoch_metrics(train=False).results()
    assert np.isfinite(val["generator_loss"])
    sr = pp.generate(lr)
    assert sr.shape == (8, 16, 16, 3)


def test_pp_rejects_bad_configs(tmp_path):
    with pytest.raises(ValueError, match="stage"):
        _model(tmp_path, "bad", mesh=make_mesh({DATA_AXIS: 8}),
               pipeline_parallel=True)
    with pytest.raises(ValueError, match="mesh"):
        _model(tmp_path, "bad2", mesh=None, pipeline_parallel=True)
    # stage count must divide the trunk depth (pipeline_apply validates)
    with pytest.raises(ValueError, match="divisible"):
        _model(tmp_path, "bad3", mesh=make_mesh({STAGE_AXIS: 8}),
               pipeline_parallel=True, num_blocks=6)
    # mutually exclusive with tensor_parallel
    from simplesr_tpu.parallel import MODEL_AXIS
    with pytest.raises(ValueError, match="mutually exclusive"):
        SRModel(model_type="resnet", generator=_gen(),
                generator_optimizer="SGD",
                generator_optimizer_config={"learning_rate": 1e-2},
                config=_cfg(tmp_path, "bad4"),
                mesh=make_mesh({STAGE_AXIS: 4, MODEL_AXIS: 2}),
                pipeline_parallel=True, tensor_parallel=True)


def test_pp_config_factory_builds_mesh(rng, tmp_path):
    # SRModel.init with config.pipeline_parallel=s builds a dp×stage mesh
    lr, hr = _batch(rng, n=8)
    cfg = _cfg(tmp_path, "factory")
    cfg.pipeline_parallel = 4
    cfg.data_parallel = False
    model = SRModel.init(cfg, _gen(), "SGD", {"learning_rate": 1e-2})
    single = _model(tmp_path, "factory_sd")
    model.train_step(lr, hr)
    single.train_step(lr, hr)
    for a, b in zip(_leaves(model), _leaves(single)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
