"""JPEG-noise (denoising SR) campaign — trains the reference's headline
`jpg_noise: true` recipe (/root/reference/simple_sr/data_pipeline/
data_pipeline.py:318-330; README denoising gallery) with the TPU-native
on-device DCT degrade (ops/jpeg.py) in the training loop.

What it proves beyond the unit tests (tests/ops/test_jpeg.py tracks libjpeg
to ±0.12 dB): training THROUGH the differentiable-pipeline degrade produces
a model that removes REAL libjpeg artifacts — evaluation degrades LR inputs
with actual PIL/libjpeg encoding at the same quality, never the kernel that
trained the model, so the result measures generalization from the DCT
approximation to true JPEG.

Outputs (results/quality_r3/):
  RESULTS_jpg.json / RESULTS_jpg.md   noise-trained vs clean-trained
                                      (round-2 srresnet) vs bicubic on
                                      libjpeg-degraded inputs
  models/resnet_gen_srresnet_jpg_x2_best.msgpack
  galleries/srresnet_jpg/             annotated grids + half-splits

Run: python scripts/jpg_noise_campaign.py [--fast]
"""

import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simplesr_tpu.data import read_img
from simplesr_tpu.ops import (augment, batch_random_crops, psnr, psnr_on_y,
                              resize, ssim)
from simplesr_tpu.ops.jpeg import jpeg_degrade
from simplesr_tpu.train import Generator, SRModel
from simplesr_tpu.train.serialization import load_model
from simplesr_tpu.train.optimizers import piecewise_constant_decay
from simplesr_tpu.eval import rendering

TRAIN_IMGS = {
    "div2k_0004": "/root/reference/data/datasets/div2k/4/0004.png",
    "div2k_0006": "/root/reference/data/datasets/div2k/8/0006.png",
    "lena": "/root/reference/tests/data/lena.png",
}
HELDOUT_IMGS = {
    "baboon": "/root/reference/tests/data/baboon.png",
    "comic": "/root/reference/tests/data/comic.png",
}
SCALE = 2
CROP = 96
BATCH = 16
JPG_NOISE_LEVEL = 50            # reference DataPipeline default scale
JPEG_QUALITY = 100 - JPG_NOISE_LEVEL
AUGS = ["flip_along_x", "flip_along_y", "rotate90"]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "results", "quality_r3")
CLEAN_MODEL = os.path.join(REPO, "results", "quality_r2", "models",
                           "resnet_gen_srresnet_x2_best.msgpack")


def _cfg(tmp, patience):
    class Cfg:
        model_dir = tmp + "/models"
        checkpoint_dir = tmp + "/ckpt"
        early_stop_metric = "psnr"
        early_stop_patience = patience
        epoch_train_summary_writer = None
        batch_train_summary_writer = None
        epoch_validation_summary_writer = None
        batch_validation_summary_writer = None
    return Cfg


def _pairs(hr_crops):
    """(degraded LR, HR) pairs — the DCT JPEG degrade runs on device inside
    the staging pass, mirroring DataPipeline's jpg_noise=True batch prep
    (data_pipeline.py:314-316 here; reference :318-330)."""
    lr = resize(hr_crops / 255.0, (CROP // SCALE, CROP // SCALE),
                method="bicubic", antialias=True)
    lr = jpeg_degrade(lr, JPEG_QUALITY)
    return (jnp.asarray(lr, jnp.float32),
            jnp.asarray(hr_crops / 127.5 - 1.0, jnp.float32))


def stage_dataset(crops_per_mpix=96, val_crops_per_img=32):
    train_parts, val_parts = [], []
    for i, (name, path) in enumerate(TRAIN_IMGS.items()):
        img = jnp.asarray(read_img(path))
        mpix = img.shape[0] * img.shape[1] / 1e6
        n = max(48, int(mpix * crops_per_mpix))
        train_parts.append(batch_random_crops(
            jax.random.key(1000 + i), img[None], num_crops=n,
            patch_size=(CROP, CROP)))
        val_parts.append(batch_random_crops(
            jax.random.key(2000 + i), img[None], num_crops=val_crops_per_img,
            patch_size=(CROP, CROP)))
    base = jnp.concatenate(train_parts)
    fanout = [base]
    for i, name in enumerate(AUGS):
        fn = augment.AUGMENTATIONS[name]
        keys = jax.random.split(jax.random.key(3000 + i), base.shape[0])
        fanout.append(jax.vmap(lambda k, x, f=fn: f(k, x))(keys, base))
    lr_train, hr_train = _pairs(jnp.concatenate(fanout))
    n = (hr_train.shape[0] // BATCH) * BATCH
    lr_val, hr_val = _pairs(jnp.concatenate(val_parts))
    m = (hr_val.shape[0] // BATCH) * BATCH
    return (lr_train[:n], hr_train[:n]), (lr_val[:m], hr_val[:m])


def libjpeg_degrade_01(img_01, quality=JPEG_QUALITY):
    """REAL JPEG round-trip via PIL/libjpeg — the evaluation degrade, so
    results measure generalization from the training-time DCT kernel to
    true libjpeg artifacts."""
    from PIL import Image

    u8 = np.clip(np.round(np.asarray(img_01) * 255.0), 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format="JPEG", quality=int(quality))
    back = np.asarray(Image.open(buf).convert("RGB"), np.float32) / 255.0
    return back


def run_training(model, train, val, max_epochs, label):
    (lr_t, hr_t), (lr_v, hr_v) = train, val
    n = lr_t.shape[0]
    batches = n // BATCH
    perm_key = jax.random.key(7)
    t0 = time.perf_counter()
    for epoch in range(max_epochs):
        if model.stop_early():
            print(f"[{label}] early stop after epoch {epoch}", flush=True)
            break
        model.before_epoch()
        perm_key, sub = jax.random.split(perm_key)
        order = jax.random.permutation(sub, n)
        lr_t, hr_t = lr_t[order], hr_t[order]
        for b in range(batches):
            model.train_step(lr_t[b * BATCH:(b + 1) * BATCH],
                             hr_t[b * BATCH:(b + 1) * BATCH])
            model.after_train_batch()
        for b in range(lr_v.shape[0] // BATCH):
            model.validation_step(lr_v[b * BATCH:(b + 1) * BATCH],
                                  hr_v[b * BATCH:(b + 1) * BATCH])
            model.after_validation_batch()
        model.after_epoch()
        val_psnr = model.histories()["valid_epoch"]["psnr"][-1]
        print(f"[{label}] epoch {epoch + 1}: val psnr "
              f"{float(np.asarray(val_psnr)):.3f} best "
              f"{float(model.state.best_metric):.3f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    model.after_training()
    return model


def _degraded_inputs(img_01):
    """(hr_ref [-1,1], degraded lr [0,1], clean lr [0,1]) for a full image."""
    h = (img_01.shape[0] // SCALE) * SCALE
    w = (img_01.shape[1] // SCALE) * SCALE
    hr_ref = jnp.asarray(img_01[:h, :w]) * 2.0 - 1.0
    lr = np.asarray(resize(jnp.asarray(img_01[None, :h, :w]),
                           (h // SCALE, w // SCALE),
                           method="bicubic", antialias=True)[0])
    lr_jpg = libjpeg_degrade_01(lr)
    return hr_ref, lr_jpg, lr


def _metrics(hr, out):
    return {
        "psnr": round(float(psnr(hr[None], out[None], max_val=2.0)[0]), 3),
        "psnr_y": round(float(psnr_on_y(hr[None], out[None], max_val=2.0)[0]), 3),
        "ssim": round(float(ssim(hr[None], out[None], max_val=2.0)[0]), 4),
    }


def evaluate_and_render(noise_model, results, label="srresnet_jpg"):
    clean_predict = None
    if os.path.exists(CLEAN_MODEL):
        module, variables = load_model(CLEAN_MODEL)
        clean_predict = lambda lr: module.apply(
            variables, jnp.asarray(lr)[None], train=False)[0]
    gal_dir = os.path.join(OUT_DIR, "galleries", label)

    for name, path in {**TRAIN_IMGS, **HELDOUT_IMGS}.items():
        img = read_img(path) / 255.0
        hr, lr_jpg, lr_clean = _degraded_inputs(img)
        h, w = hr.shape[0], hr.shape[1]
        sr_noise = jnp.asarray(
            noise_model.generate(jnp.asarray(lr_jpg)[None])[0], jnp.float32)
        bic = resize(jnp.asarray(lr_jpg[None]) * 2.0 - 1.0, (h, w),
                     method="bicubic")[0]
        row = {
            "noise_trained": _metrics(hr, sr_noise),
            "bicubic": _metrics(hr, bic),
            "jpeg_quality": JPEG_QUALITY,
            "heldout": name in HELDOUT_IMGS,
        }
        outs = {"noise model": sr_noise, "bicubic": bic}
        if clean_predict is not None:
            sr_clean = jnp.asarray(clean_predict(lr_jpg), jnp.float32)
            row["clean_trained"] = _metrics(hr, sr_clean)
            outs["clean model"] = sr_clean
        results.setdefault(label, {})[name] = row
        msg = " | ".join(f"{k}: {v['psnr']:.2f}dB/{v['ssim']:.4f}"
                         for k, v in row.items()
                         if isinstance(v, dict))
        print(f"[{label}] {name}: {msg}"
              f"{' (heldout)' if row['heldout'] else ''}", flush=True)

        if name in HELDOUT_IMGS:
            vals_psnr = {k: np.array([_metrics(hr, v)["psnr"]])
                         for k, v in outs.items()}
            vals_ssim = {k: np.array([_metrics(hr, v)["ssim"]])
                         for k, v in outs.items()}
            rendering.prepare_image_grid(
                gal_dir, f"{name}_grid", low_res_key="noisy LR",
                **{k.replace(" ", "_"): np.asarray(v)[None]
                   for k, v in outs.items()},
                **{"noisy LR": np.asarray(lr_jpg)[None],
                   "ground truth": np.asarray(hr)[None]},
                psnr={**{k.replace(" ", "_"): v for k, v in vals_psnr.items()},
                      "noisy LR": np.array([-1.0]),
                      "ground truth": np.array([np.inf])},
                ssim={**{k.replace(" ", "_"): v for k, v in vals_ssim.items()},
                      "noisy LR": np.array([-1.0]),
                      "ground truth": np.array([1.0])})
            if clean_predict is not None:
                rendering.combine_halfs(
                    np.asarray(sr_noise), np.asarray(outs["clean model"]),
                    "noise_vs_clean", gal_dir, f"{name}_half")
    return results


def _write_markdown(results):
    lines = [
        "# JPEG-noise recipe results (round 3)",
        "",
        f"SRResNet x{SCALE} trained with the on-device DCT JPEG degrade "
        f"(`jpg_noise` level {JPG_NOISE_LEVEL} → quality {JPEG_QUALITY}) in "
        "the LR branch; evaluated on inputs degraded with REAL libjpeg at "
        "the same quality. `clean_trained` is the round-2 srresnet (never "
        "saw JPEG artifacts); both upscale the same degraded inputs.",
        "",
        "| image | | PSNR | PSNR-Y | SSIM |",
        "|---|---|---|---|---|",
    ]
    for label in results:
        for name, row in results[label].items():
            tag = "held-out" if row["heldout"] else "train-member"
            for key in ("noise_trained", "clean_trained", "bicubic"):
                if key in row:
                    m = row[key]
                    lines.append(f"| {name} ({tag}) | {key} | {m['psnr']} "
                                 f"| {m['psnr_y']} | {m['ssim']} |")
    with open(os.path.join(OUT_DIR, "RESULTS_jpg.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def main(fast=False):
    os.makedirs(os.path.join(OUT_DIR, "models"), exist_ok=True)
    max_epochs = 3 if fast else 120
    patience = 10**6 if fast else 8

    print("staging jpeg-degraded dataset on device...", flush=True)
    train, val = stage_dataset(crops_per_mpix=12 if fast else 96,
                               val_crops_per_img=16 if fast else 32)
    steps_hint = (train[0].shape[0] // BATCH) * max_epochs
    print(f"{train[0].shape[0]} train pairs, {val[0].shape[0]} val pairs",
          flush=True)

    tmp = tempfile.mkdtemp(prefix="campaign_jpg_")
    schedule = piecewise_constant_decay(
        [steps_hint // 2, (3 * steps_hint) // 4], [2e-4, 1e-4, 5e-5])
    size = dict(num_blocks=2, num_filters=16) if fast else {}
    gen = Generator.srresnet(upsample_factor=SCALE, batch_norm=False,
                             input_dims=(CROP // SCALE, CROP // SCALE), **size)
    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": schedule},
                    config=_cfg(tmp, patience))
    print(f"=== training srresnet_jpg x{SCALE} ===", flush=True)
    run_training(model, train, val, max_epochs, "srresnet_jpg")
    saved = model.save_model(os.path.join(OUT_DIR, "models"),
                             postfix=f"srresnet_jpg_x{SCALE}_best")
    print(f"saved {saved}", flush=True)

    results = {"scale": SCALE, "jpg_noise_level": JPG_NOISE_LEVEL}
    results_path = os.path.join(OUT_DIR, "RESULTS_jpg.json")
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = {**json.load(f), **results}
    evaluate_and_render(model, results)
    with open(results_path, "w") as f:
        json.dump(results, f, indent=2)
    _write_markdown({k: v for k, v in results.items()
                     if isinstance(v, dict)})
    print("jpg-noise campaign complete", flush=True)


if __name__ == "__main__":
    main(fast="--fast" in sys.argv[1:])
