"""Measure EMA shadow weights on a real GAN stage (TPU).

GAN generators oscillate: the adversarial gradient keeps kicking the raw
weights around the perceptual optimum. `SRModel(ema_decay=...)` tracks an
EMA of the generator inside the fused step; this study trains a
pixel-anchored SRGAN stage (same recipe as the committed `srgan` campaign
stage, warm-started from the committed ×2 SRResNet best) and records, per
epoch, held-out PSNR of the RAW generator vs its EMA shadow — the
stability/quality claim, measured.

Run: python scripts/ema_study.py [--epochs 15] [--decay 0.995]
Writes results/quality_r3/EMA.json.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRETRAINED = "results/quality_r2/models/resnet_gen_srresnet_x2_best.msgpack"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--decay", type=float, default=0.995)
    p.add_argument("--out", default="results/quality_r3")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    import quality_campaign as qc
    from simplesr_tpu.ops import psnr, ssim, resize
    from simplesr_tpu.train import Discriminator, Generator, SRModel

    train, val = qc.stage_dataset()
    lr_t, hr_t = train
    n = lr_t.shape[0]
    batches = n // qc.BATCH
    print(f"dataset: {n} train crops, {batches} batches/epoch", flush=True)

    lr_dims = (qc.CROP // qc.SCALE, qc.CROP // qc.SCALE)
    gen = Generator.srgan_generator(
        upsample_factor=qc.SCALE, vgg_loss=False, batch_norm=False,
        adversarial_loss_weight=1e-3, input_dims=lr_dims,
        pretrained_model_path=PRETRAINED)
    disc = Discriminator.initialize_standard(
        label_smoothing=True, smoothing_offset=0.2,
        input_dims=(qc.CROP, qc.CROP))
    tmp = tempfile.mkdtemp()
    model = SRModel(model_type="gan", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-4},
                    discriminator=disc, discriminator_optimizer="Adam",
                    discriminator_optimizer_config={"learning_rate": 1e-4},
                    config=qc._cfg(tmp, 10**6), ema_decay=args.decay)

    # held-out probes staged once
    probes = {}
    for name, path in qc.HELDOUT_IMGS.items():
        from simplesr_tpu.data import read_img
        img = read_img(path) / 255.0
        h = (img.shape[0] // qc.SCALE) * qc.SCALE
        w = (img.shape[1] // qc.SCALE) * qc.SCALE
        hr = jnp.asarray(img[None, :h, :w] * 2.0 - 1.0, jnp.float32)
        lr = resize(jnp.asarray(img[None, :h, :w], jnp.float32),
                    (h // qc.SCALE, w // qc.SCALE), method="bicubic",
                    antialias=True)
        probes[name] = (lr, hr)

    def probe_psnr(ema):
        out = {}
        for name, (lr, hr) in probes.items():
            sr = jnp.clip(jnp.asarray(model.generate(lr, ema=ema),
                                      jnp.float32), -1, 1)
            out[name] = {"psnr": float(psnr(hr, sr, max_val=2.0)[0]),
                         "ssim": float(ssim(hr, sr, max_val=2.0)[0])}
        return out

    perm_key = jax.random.key(7)
    history = []
    for epoch in range(args.epochs):
        model.before_epoch()
        perm_key, sub = jax.random.split(perm_key)
        order = jax.random.permutation(sub, n)
        lr_t, hr_t = lr_t[order], hr_t[order]
        for b in range(batches):
            model.train_step(lr_t[b * qc.BATCH:(b + 1) * qc.BATCH],
                             hr_t[b * qc.BATCH:(b + 1) * qc.BATCH])
        raw = probe_psnr(ema=False)
        ema = probe_psnr(ema=True)
        history.append({"epoch": epoch + 1, "raw": raw, "ema": ema})
        print(f"epoch {epoch + 1}: "
              + "  ".join(f"{k} raw {raw[k]['psnr']:.3f} / "
                          f"ema {ema[k]['psnr']:.3f}" for k in raw),
              flush=True)
        # skip validation/early-stop machinery: the study wants the raw
        # trajectory, not the best-checkpoint behavior

    # summary: per-probe mean/std over the last 2/3 of training (post
    # warm-in), where the oscillation story lives
    tail = history[len(history) // 3:]
    summary = {}
    for name in probes:
        raw_t = [h["raw"][name]["psnr"] for h in tail]
        ema_t = [h["ema"][name]["psnr"] for h in tail]
        summary[name] = {
            "raw_mean": float(np.mean(raw_t)), "raw_std": float(np.std(raw_t)),
            "ema_mean": float(np.mean(ema_t)), "ema_std": float(np.std(ema_t)),
            "final_raw": history[-1]["raw"][name]["psnr"],
            "final_ema": history[-1]["ema"][name]["psnr"],
        }
        s = summary[name]
        print(f"{name}: tail raw {s['raw_mean']:.3f}±{s['raw_std']:.3f}  "
              f"ema {s['ema_mean']:.3f}±{s['ema_std']:.3f}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "EMA.json")
    with open(out_path, "w") as f:
        json.dump({"decay": args.decay, "epochs": args.epochs,
                   "recipe": "srgan pixel-anchored, warm from srresnet x2",
                   "history": history, "summary": summary}, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
