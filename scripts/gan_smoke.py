"""GAN-dynamics smoke: run a short SRGAN training (G + D simultaneous
update, label smoothing) on real crops and report the loss/accuracy
trajectories — evidence the adversarial game is stable (D accuracy settles
between chance and saturation, no divergence, all values finite).

Run: python scripts/gan_smoke.py [steps]
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
from simplesr_tpu.ops import resize, batch_random_crops
from simplesr_tpu.train import Generator, Discriminator, SRModel

SCALE, CROP, BATCH = 4, 96, 16


def main(steps=1500):
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

    img = read_img("/root/reference/data/datasets/div2k/4/0004.png")
    crops = batch_random_crops(jax.random.key(0), jnp.asarray(img)[None],
                               num_crops=512, patch_size=(CROP, CROP))
    lr_all = jnp.asarray(resize(crops / 255.0, (CROP // SCALE, CROP // SCALE),
                                method="bicubic", antialias=True), jnp.float32)
    hr_all = jnp.asarray(crops / 127.5 - 1.0, jnp.float32)

    gen = Generator.srgan_generator(
        upsample_factor=SCALE, vgg_loss=False, adversarial_loss_weight=1e-3,
        input_dims=(CROP // SCALE, CROP // SCALE))
    disc = Discriminator.initialize_standard(
        label_smoothing=True, smoothing_offset=0.2, input_dims=(CROP, CROP))
    model = SRModel(model_type="gan", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-4},
                    discriminator=disc, discriminator_optimizer="Adam",
                    discriminator_optimizer_config={"learning_rate": 1e-4},
                    config=Cfg)

    t0 = time.perf_counter()
    model.before_epoch()
    n = lr_all.shape[0]
    for step in range(steps):
        i = (step * BATCH) % (n - BATCH)
        model.train_step(lr_all[i:i + BATCH], hr_all[i:i + BATCH])
        if step % 250 == 249:
            gm = {k: float(np.asarray(v)) for k, v in
                  model.generator_wrapper().batch_metrics().last_values().items()}
            dm = {k: float(np.asarray(v)) for k, v in
                  model.discriminator_wrapper().batch_metrics().last_values().items()}
            print(f"step {step + 1}: G={gm.get('generator_loss', float('nan')):.4f} "
                  f"(adv {gm.get('adversarial_loss', float('nan')):.3f}) "
                  f"D={dm.get('discriminator_loss', float('nan')):.3f} "
                  f"acc={dm.get('discriminator_accuracy', float('nan')):.2f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        model.after_train_batch()

    gm = model.generator_wrapper().epoch_metrics(True).results()
    dm = model.discriminator_wrapper().epoch_metrics(True).results()
    finite = all(np.isfinite(v) for v in list(gm.values()) + list(dm.values()))
    acc = dm.get("discriminator_accuracy", float("nan"))
    stable = finite and 0.2 <= acc <= 0.999
    print(f"epoch means: G {gm.get('generator_loss'):.4f} "
          f"D {dm.get('discriminator_loss'):.4f} acc {acc:.3f} "
          f"SR_acc {dm.get('SR_accuracy'):.3f} HR_acc {dm.get('HR_accuracy'):.3f}")
    print("GAN_STABLE" if stable else "GAN_UNSTABLE", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1500)
