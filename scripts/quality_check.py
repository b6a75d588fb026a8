"""Quality gate: train SRResNet on the real photos available in this
environment and verify the model beats bicubic interpolation on a held-out
image — the end-to-end "is the whole stack learning?" signal.

The full DIV2K/Set5 corpora are not present (zero egress), so the gate is
scaled to the data that is: training pools crops from the DIV2K excerpts +
lena + baboon, the held-out probe is comic.png (never seen). ×2 by default —
with this much data ×2 SR beats bicubic within a few thousand steps, while
×4 would need the real 800-image corpus (paper models train 10⁵–10⁶ steps).

To keep the run device-bound (the axon tunnel charges ~80 ms + a slow upload
per host transfer), all crops are generated once with the framework's own
ops and pre-staged on device.

Run: python scripts/quality_check.py [steps] [scale]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simplesr_tpu.data import read_img
from simplesr_tpu.ops import psnr, ssim, resize, batch_random_crops, augment
from simplesr_tpu.train import Generator, SRModel

TRAIN_IMGS = [
    "/root/reference/data/datasets/div2k/4/0004.png",
    "/root/reference/data/datasets/div2k/8/0006.png",
    "/root/reference/tests/data/lena.png",
]
HELDOUT_IMGS = [
    "/root/reference/tests/data/baboon.png",   # photographic, unseen
    "/root/reference/tests/data/comic.png",    # line art, out of domain
]
CROP = 96
BATCH = 16


def _pairs(hr_crops, scale):
    lr = resize(hr_crops / 255.0, (CROP // scale, CROP // scale),
                method="bicubic", antialias=True)
    hr = hr_crops / 127.5 - 1.0
    return jnp.asarray(lr, jnp.float32), jnp.asarray(hr, jnp.float32)


def main(steps=4000, scale=2):
    tmp = tempfile.mkdtemp()

    class Cfg:
        model_dir = tmp + "/models"
        checkpoint_dir = tmp + "/ckpt"
        early_stop_metric = "psnr"
        early_stop_patience = 10**6
        epoch_train_summary_writer = None
        batch_train_summary_writer = None
        epoch_validation_summary_writer = None
        batch_validation_summary_writer = None

    # -------- stage training crops (framework ops, one device upload)
    all_crops = []
    for i, path in enumerate(TRAIN_IMGS):
        img = jnp.asarray(read_img(path))
        n = max(64, int(img.shape[0] * img.shape[1] / 40000))
        all_crops.append(batch_random_crops(
            jax.random.key(i), img[None], num_crops=n, patch_size=(CROP, CROP)))
    crops = jnp.concatenate(all_crops)
    augd = [crops]
    for i, name in enumerate(["flip_along_x", "flip_along_y", "rotate90"]):
        augd.append(jax.vmap(
            lambda k, x, f=augment.AUGMENTATIONS[name]: f(k, x))(
            jax.random.split(jax.random.key(100 + i), crops.shape[0]), crops))
    hr_all = jnp.concatenate(augd)
    lr_all, hr_all = _pairs(hr_all, scale)
    n = (hr_all.shape[0] // BATCH) * BATCH
    lr_all, hr_all = lr_all[:n], hr_all[:n]
    print(f"staged {n} training pairs on device (scale x{scale})", flush=True)

    from simplesr_tpu.train.optimizers import piecewise_constant_decay
    arch = os.environ.get("QUALITY_ARCH", "srresnet")
    if arch == "rrdb":
        gen = Generator.rrdb(upsample_factor=scale, num_blocks=8,
                             input_dims=(CROP // scale, CROP // scale))
    else:
        gen = Generator.srresnet(upsample_factor=scale, batch_norm=False,
                                 input_dims=(CROP // scale, CROP // scale))
    schedule = piecewise_constant_decay(
        [steps // 2, (3 * steps) // 4], [2e-4, 1e-4, 5e-5])
    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": schedule},
                    config=Cfg)

    t0 = time.perf_counter()
    model.before_epoch()
    perm_key = jax.random.key(42)
    batches = n // BATCH
    for step in range(steps):
        if step % batches == 0:
            perm_key, sub = jax.random.split(perm_key)
            order = jax.random.permutation(sub, n)
            lr_all, hr_all = lr_all[order], hr_all[order]
        i = (step % batches) * BATCH
        model.train_step(lr_all[i:i + BATCH], hr_all[i:i + BATCH])
        if step % 1000 == 999:
            loss = float(model.generator_wrapper().batch_metrics()
                         .ensure("generator_loss")._values[-1])
            print(f"step {step + 1}: loss={loss:.5f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        model.after_train_batch()

    # -------------------------------------------------------- evaluation
    variables = {"params": model.state.g_params}
    if model.state.g_batch_stats:
        variables["batch_stats"] = model.state.g_batch_stats
    fwd = jax.jit(lambda v, x: gen.model().apply(v, x, train=False))

    def eval_image(path, label):
        region = read_img(path)
        hh = (region.shape[0] // CROP) * CROP
        ww = (region.shape[1] // CROP) * CROP
        tiles = jnp.asarray(region[:hh, :ww]).reshape(
            hh // CROP, CROP, ww // CROP, CROP, 3).transpose(0, 2, 1, 3, 4) \
            .reshape(-1, CROP, CROP, 3)
        lr_t, hr_t = _pairs(tiles, scale)
        outs = []
        for i in range(0, lr_t.shape[0], BATCH):
            chunk = lr_t[i:i + BATCH]
            pad = BATCH - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate([chunk, jnp.zeros((pad,) + chunk.shape[1:])])
            outs.append(fwd(variables, chunk)[:BATCH - pad if pad else BATCH])
        sr = jnp.concatenate(outs)
        bic = resize(lr_t * 2.0 - 1.0, (CROP, CROP), method="bicubic")
        mp = float(jnp.mean(psnr(hr_t, sr, max_val=2.0)))
        ms = float(jnp.mean(ssim(hr_t, sr, max_val=2.0)))
        bp = float(jnp.mean(psnr(hr_t, bic, max_val=2.0)))
        bs = float(jnp.mean(ssim(hr_t, bic, max_val=2.0)))
        print(f"{label}: model PSNR {mp:.2f} SSIM {ms:.4f} | "
              f"bicubic PSNR {bp:.2f} SSIM {bs:.4f} | "
              f"{'BEATS_BICUBIC' if mp > bp else 'BELOW_BICUBIC'}", flush=True)
        return mp, bp

    # in-distribution check: a training member — the model must clearly beat
    # bicubic here if the stack is learning correctly
    eval_image(TRAIN_IMGS[2], f"train-member lena.png x{scale}")
    for path in HELDOUT_IMGS:
        eval_image(path, f"held-out {os.path.basename(path)} (unseen) x{scale}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 2)
