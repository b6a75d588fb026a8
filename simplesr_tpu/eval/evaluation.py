"""Evaluation/inference operations.

Parity with reference operations/evaluation.py:14-363:
  * evaluate_on_validationdata — paired eval with PSNR / PSNR-Y / SSIM
    (max_val=2.0, images in [-1,1]), bicubic-interpolated comparison row,
    image grids with GT(∞)/LR(N/A) annotations, per-model averages logged.
    Improvement over the reference: the metric dict is also *returned*.
  * evaluate_on_testdata — unpaired inference over (image, path) batches with
    single/half/interpolated/grid outputs.
  * memory-efficient path: images >1000×1000 run through the overlap-tiled
    kernel (128 px patches, 32 px overlap — reference :119-138,256-276); the
    reference upscales patch-by-patch in a Python loop, here patches stream
    through the jitted model in fixed-size chunks (one compile, full batches).

Models may be given as SRModel, train.Generator, (module, variables) pairs,
bare callables, or paths to saved model files.
"""

import os
import logging
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from simplesr_tpu.core.ranges import to_11_from_01
from simplesr_tpu.ops import metrics as metrics_lib
from simplesr_tpu.ops.resize import resize as _resize
from simplesr_tpu.ops.tiling import tiled_apply, tiled_apply_many
from simplesr_tpu.utils import logger as logger_mod
from simplesr_tpu.eval import rendering

log = logging.getLogger(logger_mod.RESULTS_LOGGER)

_TILE_MIN_HW = 1000
_TILE_PATCH = 128
_TILE_OVERLAP = 32


def _pad_to_multiple(fn, ways):
    """Make a batch-divisibility-constrained predictor safe for any batch:
    pad with repeats of the first item up to the next multiple of `ways`
    (batch entries are independent through the convs), slice the padding
    back off. Shapes stay static under jit (one compile per padded size)."""
    import jax.numpy as jnp

    def padded(x):
        b = x.shape[0]
        r = (-b) % ways
        if r:
            x = jnp.concatenate([x, jnp.repeat(x[:1], r, axis=0)], axis=0)
        return fn(x)[:b]

    return padded


def _as_predictor(model, fast=True, ensemble=False, paired=0):
    """Normalize the many accepted model forms into `fn(lr_nhwc) -> sr`.

    `fast=True` (default) reparameterizes saved modules for serving when an
    exact rewrite exists (models/polyphase.fast_inference — 2x on SRResNet);
    `fast=False` serves the training-form module verbatim. `ensemble=True`
    wraps the predictor in the ×8 geometric self-ensemble
    (ops/ensemble.py) — ~8× the FLOPs for a PSNR bump; on the tiled path
    the ensemble applies per square tile. `paired=w` additionally applies
    the batch→channel paired-trunk rewrite (models/paired.py) to saved
    SRResNet/RRDB modules; non-divisible batches are padded internally, so
    the predictor contract is unchanged."""
    from simplesr_tpu.train.sr_model import SRModel
    from simplesr_tpu.train.generator import Generator
    from simplesr_tpu.train import serialization

    from simplesr_tpu.models.polyphase import fast_inference
    from simplesr_tpu.ops.ensemble import ensemble_predictor

    if fast or paired:
        # paired with fast=False keeps the training-form tail (the paired
        # trunk applies either way; RRDB keeps its production tail always)
        reparam = lambda module, variables: fast_inference(
            module, variables, paired_ways=paired, polyphase=fast)
    else:  # opt-out: serve the training-form module verbatim
        reparam = lambda module, variables: (module, variables)
    wrap = ensemble_predictor if ensemble else (lambda fn: fn)
    if paired:
        inner_wrap, wrap = wrap, (
            lambda fn: inner_wrap(_pad_to_multiple(fn, paired)))

    if isinstance(model, (str, os.PathLike)):
        module, variables = serialization.load_model(str(model))
        module, variables = reparam(module, variables)
        return wrap(jax.jit(lambda x: module.apply(variables, x, train=False)))
    if isinstance(model, SRModel):
        return wrap(model.generate)
    if isinstance(model, Generator):
        return wrap(model.generate)
    if isinstance(model, tuple) and len(model) == 2:
        module, variables = reparam(*model)
        return wrap(jax.jit(lambda x: module.apply(variables, x, train=False)))
    if callable(model):
        return wrap(model)
    raise TypeError(f"cannot build a predictor from {type(model)}")


def _load_models(config, model, model_name, fast=True, ensemble=False):
    if model is None:
        if getattr(config, "model_path", None) is None:
            raise ValueError("No model was supplied and config does not contain path to model")
        paths = config.model_path
        if not isinstance(paths, list):
            paths = [paths]
        return {Path(p).stem: _as_predictor(p, fast=fast, ensemble=ensemble)
                for p in paths}
    if isinstance(model, dict):
        return {k: _as_predictor(v, fast=fast, ensemble=ensemble)
                for k, v in model.items()}
    return {model_name: _as_predictor(model, fast=fast, ensemble=ensemble)}


def _hw(tensor):
    if tensor.ndim == 4:
        return int(tensor.shape[1]), int(tensor.shape[2])
    if tensor.ndim == 3:
        return int(tensor.shape[0]), int(tensor.shape[1])
    raise ValueError(f"Received tensor with unexpected rank: {tensor.ndim}")


def _eligible_efficient_inference(tensor, min_width=_TILE_MIN_HW,
                                  min_height=_TILE_MIN_HW):
    if tensor.ndim not in (3, 4):
        return False
    if tensor.ndim == 4 and tensor.shape[0] != 1:
        return False
    h, w = _hw(tensor)
    return h > min_height and w > min_width


def _upscale(predict, lr_batch, scale):
    """SR a batch; large single images go through the overlap-tiled path."""
    x = jnp.asarray(lr_batch)
    if _eligible_efficient_inference(x):
        img = x[0] if x.ndim == 4 else x
        out = tiled_apply(predict, img, (_TILE_PATCH, _TILE_PATCH),
                          overlap=_TILE_OVERLAP, scale=scale, batch_size=8)
        return out[None]
    if x.ndim == 3:
        x = x[None]
    return predict(x)


def evaluate_on_validationdata(config, model_name="", pipeline=None, model=None,
                               save_grid=False, combine_halfs=False,
                               save_single=False, save_prefix="",
                               calc_stats=False, fast=True, ensemble=None):
    """Paired evaluation on the pipeline's validation set. Returns
    {model_or_interp_name: {"psnr": [...], "psnr-y": [...], "ssim": [...]}}
    (values per image) when calc_stats, else {}."""
    from simplesr_tpu.data import DataPipeline

    if pipeline is None:
        pipeline = DataPipeline.from_config(config)
    if ensemble is None:
        ensemble = bool(getattr(config, "self_ensemble", False))
    models = _load_models(config, model, model_name, fast=fast,
                          ensemble=ensemble)

    ground_truth_key = "GT"
    low_res_key = "LR"
    interpolated_key = str(pipeline.resize_filter)
    psnr_y_key = "psnr-y"

    metrics_res = {name: {"psnr": [], psnr_y_key: [], "ssim": []}
                   for name in list(models) + [interpolated_key]}
    scale = config.scale
    pic_dir = getattr(config, "pic_dir", ".")

    for idx, (lr_batch, hr_batch) in enumerate(pipeline.validation_batch_generator()):
        result_pics = {ground_truth_key: hr_batch, low_res_key: lr_batch}

        # lr is [0,1]; bring to [-1,1] before interpolation for comparison
        _lr11 = to_11_from_01(lr_batch)
        h, w = _hw(lr_batch)
        interpolated = _resize(_lr11, (h * scale, w * scale),
                               method=pipeline.resize_filter)
        # adjust hr for integer-rounded sizes
        if _hw(hr_batch) != (h * scale, w * scale):
            hr_batch = _resize(hr_batch, (h * scale, w * scale))
        result_pics[interpolated_key] = interpolated

        def _accumulate(name, sr):
            metrics_res[name]["psnr"].append(
                np.asarray(metrics_lib.psnr(hr_batch, sr, max_val=2.0)))
            metrics_res[name][psnr_y_key].append(
                np.asarray(metrics_lib.psnr_on_y(hr_batch, sr, max_val=2.0)))
            metrics_res[name]["ssim"].append(
                np.asarray(metrics_lib.ssim(hr_batch, sr, max_val=2.0)))

        if calc_stats:
            _accumulate(interpolated_key, interpolated)
        if save_single:
            rendering.save_single(interpolated, os.path.join(pic_dir, "interpolated"),
                                  f"{save_prefix}{idx}")
            rendering.save_single(_lr11, os.path.join(pic_dir, "low_res"),
                                  f"{save_prefix}{idx}")

        for name, predict in models.items():
            sr_batch = _upscale(predict, lr_batch, scale)
            result_pics[name] = sr_batch
            if calc_stats:
                _accumulate(name, sr_batch)
            if save_single:
                rendering.save_single(sr_batch, os.path.join(pic_dir, name, "single"),
                                      f"{save_prefix}{idx}")
            if combine_halfs:
                rendering.combine_halfs(
                    left_tensor=sr_batch,
                    right_tensor=_resize(_lr11, _hw(sr_batch),
                                         method=pipeline.resize_filter),
                    left_label=name, right_label=interpolated_key,
                    save_dir=os.path.join(pic_dir, name, "half"),
                    fname=f"{save_prefix}{idx}")

        if save_grid:
            n = int(np.asarray(hr_batch).shape[0]) if np.asarray(hr_batch).ndim == 4 else 1
            if calc_stats:
                batch_psnr = {name: metrics_res[name]["psnr"][-1]
                              for name in metrics_res}
                batch_psnr[ground_truth_key] = np.full(n, float("inf"))
                batch_psnr[low_res_key] = np.full(n, -1.0)
                batch_ssim = {name: metrics_res[name]["ssim"][-1]
                              for name in metrics_res}
                batch_ssim[ground_truth_key] = np.ones(n)
                batch_ssim[low_res_key] = np.full(n, -1.0)
            else:
                batch_psnr = batch_ssim = None
            rendering.prepare_image_grid(
                save_dir=os.path.join(pic_dir, "grids"),
                fname=f"{save_prefix}{idx}", low_res_key=low_res_key,
                psnr=batch_psnr, ssim=batch_ssim, **result_pics)

    results = {}
    if calc_stats:
        for name, res in metrics_res.items():
            results[name] = {k: np.concatenate(v) if v else np.array([])
                             for k, v in res.items()}
        for name, res in results.items():
            log.info(f"Average PSNR for {name}: {np.mean(res['psnr']):.4f}")
            log.info(f"Average PSNR on y-channel for {name}: {np.mean(res[psnr_y_key]):.4f}")
            log.info(f"Average SSIM for {name}: {np.mean(res['ssim']):.4f}")
    return results


def evaluate_on_testdata(config, model_name="", pipeline=None, model=None,
                         save_single=True, combine_halfs=False,
                         interpolate=True, grid=True, with_original=False,
                         save_prefix="", fast=True, ensemble=None):
    """Unpaired inference over the pipeline's test set (reference :214-320)."""
    from simplesr_tpu.data import DataPipeline

    if pipeline is None:
        pipeline = DataPipeline.inference_pipeline(config)
    if ensemble is None:
        ensemble = bool(getattr(config, "self_ensemble", False))
    models = _load_models(config, model, model_name, fast=fast,
                          ensemble=ensemble)
    scale = config.scale
    pic_dir = getattr(config, "pic_dir", ".")
    batch_size = getattr(config, "batch_size", 1)

    # Two passes: collect the batches first so the >1000x1000 images can be
    # tiled TOGETHER per model (tiled_apply_many pools every image's patches
    # into shared full chunks — one ragged chunk total instead of one per
    # image; the reference loops patch-by-patch per image, :351-359).
    batches = list(pipeline.test_batch_generator(batch_size))
    tiled_idx = [i for i, (lr, _) in enumerate(batches)
                 if _eligible_efficient_inference(jnp.asarray(lr))]
    tiled_sr = {}
    for name, predict in models.items():
        if not tiled_idx:
            break
        imgs = [jnp.asarray(batches[i][0]) for i in tiled_idx]
        imgs = [x[0] if x.ndim == 4 else x for x in imgs]
        outs = tiled_apply_many(predict, imgs, (_TILE_PATCH, _TILE_PATCH),
                                overlap=_TILE_OVERLAP, scale=scale, batch_size=8)
        tiled_sr[name] = dict(zip(tiled_idx, outs))

    outputs = []
    for idx, (lr_batch, file_paths) in enumerate(batches):
        original_name = Path(str(file_paths[0])).parent.stem
        results = {}
        for name, predict in models.items():
            if idx in tiled_sr.get(name, {}):
                sr_batch = tiled_sr[name][idx][None]
            else:
                sr_batch = _upscale(predict, lr_batch, scale)
            results[name] = sr_batch
            if save_single:
                rendering.save_single(
                    sr_batch, os.path.join(pic_dir, original_name, "single"),
                    f"{save_prefix}{idx}_{original_name}_{name}")
            if combine_halfs:
                rendering.combine_halfs(
                    left_tensor=sr_batch,
                    right_tensor=_resize(jnp.asarray(lr_batch), _hw(sr_batch)),
                    left_label=name, right_label="interpolated",
                    save_dir=os.path.join(pic_dir, original_name, "half"),
                    fname=f"{save_prefix}{idx}_{original_name}_{name}")

        if interpolate and results:
            some_sr = next(iter(results.values()))
            results["interpolated"] = _resize(jnp.asarray(lr_batch),
                                              _hw(some_sr), method="nearest")
            if save_single:
                rendering.save_single(
                    results["interpolated"],
                    os.path.join(pic_dir, "interpolated"), f"{save_prefix}{idx}")

        original = None
        if with_original:
            original = getattr(config, "test_originals", {}).get(original_name)

        if grid:
            rendering.prepare_image_grid(
                save_dir=os.path.join(pic_dir, "grids"),
                fname=f"{save_prefix}{idx}_{original_name}", low_res_key=None,
                psnr=None, original=original, **results)
        outputs.append(results)
    return outputs
