"""Quality-parity campaign: the committed-results analogue of the
reference's published galleries (/root/reference/docs/src/results/results.rst).

Trains SRResNet x2 and RRDB x2 to convergence (early-stopped) on every real
photo available in this zero-egress environment, then a two-stage
pretrain -> SRGAN run, and produces:

  results/quality_r2/RESULTS.md       PSNR / PSNR-Y / SSIM vs bicubic table
  results/quality_r2/RESULTS.json     same, machine-readable
  results/quality_r2/models/          trained model files
  results/quality_r2/galleries/       annotated comparison grids + half-splits

Corpus (everything there is): train = div2k 0004 + div2k 0006 + lena;
held out (never seen, not used for early stopping) = baboon (photo, in
domain) and comic (line art, out of domain). Validation crops are drawn
from the *training* images with an RNG stream disjoint from the training
crops, so model selection never sees the held-out set.

x2 because the corpus is 3 images: x4 SR needs the real 800-image DIV2K to
beat bicubic (paper models train 1e5-1e6 steps); x2 converges meaningfully
here. All crops are generated ON DEVICE from the uploaded full images (the
axon tunnel makes per-batch host uploads the bottleneck — see
docs/performance.md), and the full SRModel lifecycle runs: epochs,
validation, early stopping, best-checkpoint restore.

Run: python scripts/quality_campaign.py [--fast]   (--fast: tiny smoke)
"""

import json
import os
import shutil
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
from simplesr_tpu.train import Discriminator, Generator, SRModel
from simplesr_tpu.train.optimizers import piecewise_constant_decay
from simplesr_tpu.eval import rendering

TRAIN_IMGS = {
    "div2k_0004": "/root/reference/data/datasets/div2k/4/0004.png",
    "div2k_0006": "/root/reference/data/datasets/div2k/8/0006.png",
    "lena": "/root/reference/tests/data/lena.png",
}
# Round 4: the gallery corpus (data/corpus/gallery, extracted by
# scripts/extract_gallery_corpus.py from the reference's rendered grids —
# pristine GT tiles only, held-out probes excluded by construction and
# re-verified by tests/data/test_gallery_corpus.py) grows the unique-pixel
# corpus ~6×. Opt out with --no-gallery-corpus.
_GALLERY_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "data", "corpus", "gallery")
# Round 5 (VERDICT r4 #3): the held-out set is widened from 2 probes to 6
# images — four gallery tiles (incl. the largest, gt_1/gt_10/gt_13) are
# excluded from training entirely and scored alongside baboon/comic, so the
# quality tables report mean±spread over a set where single-image noise
# can't carry the narrative. --legacy-holdout restores the 2-probe split
# (only for comparing against pre-r5 campaigns).
HELDOUT_GALLERY = ("gt_1", "gt_10", "gt_13", "gt_6")
if os.path.isdir(_GALLERY_DIR):
    for _p in sorted(os.listdir(_GALLERY_DIR)):
        if _p.endswith(".png") and _p[:-4] not in HELDOUT_GALLERY:
            TRAIN_IMGS[_p[:-4]] = os.path.join(_GALLERY_DIR, _p)
HELDOUT_IMGS = {
    "baboon": "/root/reference/tests/data/baboon.png",
    "comic": "/root/reference/tests/data/comic.png",
}
for _p in HELDOUT_GALLERY:
    _path = os.path.join(_GALLERY_DIR, _p + ".png")
    if os.path.exists(_path):
        HELDOUT_IMGS[_p] = _path
# eval stays on the three canonical train members (one compile per distinct
# full-image shape through the tunnel — evaluating all gallery tiles would
# add ~16 shape-keyed compiles per model for no comparative value)
EVAL_TRAIN_IMGS = {
    k: TRAIN_IMGS[k] for k in ("div2k_0004", "div2k_0006", "lena")
}
SCALE = 2
CROP = 96
BATCH = 16
AUGS = ["flip_along_x", "flip_along_y", "rotate90"]

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "quality_r2")


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
    lr = resize(hr_crops / 255.0, (CROP // SCALE, CROP // SCALE),
                method="bicubic", antialias=True)
    return (jnp.asarray(lr, jnp.float32),
            jnp.asarray(hr_crops / 127.5 - 1.0, jnp.float32))


def stage_dataset(crops_per_mpix=96, val_crops_per_img=32):
    """Upload full train images once; crop + augment on device.
    Training and validation crops use disjoint RNG streams."""
    train_parts, val_parts = [], []
    for i, (name, path) in enumerate(TRAIN_IMGS.items()):
        img = jnp.asarray(read_img(path))
        if min(img.shape[0], img.shape[1]) < CROP:
            print(f"[stage] skipping {name}: {img.shape[:2]} < crop {CROP}",
                  flush=True)
            continue
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
    hr_train = jnp.concatenate(fanout)
    lr_train, hr_train = _pairs(hr_train)
    n = (hr_train.shape[0] // BATCH) * BATCH
    lr_val, hr_val = _pairs(jnp.concatenate(val_parts))
    m = (hr_val.shape[0] // BATCH) * BATCH
    return (lr_train[:n], hr_train[:n]), (lr_val[:m], hr_val[:m])


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


def _full_image_sr(model, img_01):
    """Whole-image x2 SR (dims cropped to a multiple of SCALE)."""
    h = (img_01.shape[0] // SCALE) * SCALE
    w = (img_01.shape[1] // SCALE) * SCALE
    hr_ref = jnp.asarray(img_01[:h, :w]) * 2.0 - 1.0
    lr = resize(jnp.asarray(img_01[None, :h, :w]), (h // SCALE, w // SCALE),
                method="bicubic", antialias=True)
    sr = jnp.asarray(model.generate(lr)[0], jnp.float32)
    bic = resize(lr * 2.0 - 1.0, (h, w), method="bicubic")[0]
    return hr_ref, sr, bic, lr[0]


_LP_CACHE = {}


def _lp_metric_fn():
    """The campaign's perceptual EVAL metric (VERDICT r4 #5): feature-MSE in
    a FIXED extractor space — this campaign's own srresnet pixel model
    (losses/learned_perceptual.py). Lower is better. Values are comparable
    only within one campaign (same extractor); the point is ranking GAN
    stages against their pixel parents on a perceptual axis, which
    PSNR/SSIM by design cannot show. Returns None until the srresnet pixel
    stage has been saved (subset runs before it simply omit the column)."""
    path = os.path.join(OUT_DIR, "models",
                        f"resnet_gen_srresnet_x{SCALE}_best.msgpack")
    if not os.path.exists(path):
        return None
    if _LP_CACHE.get("path") != path:
        from simplesr_tpu.losses import LearnedPerceptualLoss
        lp = LearnedPerceptualLoss(model_path=path)
        _LP_CACHE["path"] = path
        _LP_CACHE["fn"] = jax.jit(lambda a, b: lp(a, b)[0])
    return _LP_CACHE["fn"]


def evaluate(model, label, results):
    lp_fn = _lp_metric_fn()
    for name, path in {**EVAL_TRAIN_IMGS, **HELDOUT_IMGS}.items():
        img = read_img(path) / 255.0
        hr, sr, bic, _ = _full_image_sr(model, img)
        row = {}
        for tag, out in (("model", sr), ("bicubic", bic)):
            row[tag] = {
                "psnr": round(float(psnr(hr[None], out[None], max_val=2.0)[0]), 3),
                "psnr_y": round(float(psnr_on_y(hr[None], out[None], max_val=2.0)[0]), 3),
                "ssim": round(float(ssim(hr[None], out[None], max_val=2.0)[0]), 4),
            }
            if lp_fn is not None:
                row[tag]["lp"] = round(float(lp_fn(hr[None], out[None])), 5)
        row["heldout"] = name in HELDOUT_IMGS
        results.setdefault(label, {})[name] = row
        lp_note = (f" lp {row['model']['lp']:.4f}/"
                   f"{row['bicubic']['lp']:.4f}" if lp_fn else "")
        print(f"[{label}] {name}: model {row['model']['psnr']:.2f}dB "
              f"ssim {row['model']['ssim']:.4f} | bicubic "
              f"{row['bicubic']['psnr']:.2f}dB ssim {row['bicubic']['ssim']:.4f}"
              f"{lp_note}{' (heldout)' if row['heldout'] else ''}", flush=True)
    return results


def render_galleries(model, label):
    """Annotated grid + half-split for each held-out image (the analogue of
    the reference's results galleries)."""
    gal_dir = os.path.join(OUT_DIR, "galleries", label)
    for name, path in HELDOUT_IMGS.items():
        img = read_img(path) / 255.0
        hr, sr, bic, lr = _full_image_sr(model, img)
        vals = {}
        for tag, out in (("model", sr), ("bicubic", bic)):
            vals[tag] = (float(psnr(hr[None], out[None], max_val=2.0)[0]),
                         float(ssim(hr[None], out[None], max_val=2.0)[0]))
        rendering.prepare_image_grid(
            gal_dir, f"{name}_grid", low_res_key="LR",
            model=np.asarray(sr)[None], bicubic=np.asarray(bic)[None],
            LR=np.asarray(lr)[None],
            **{"ground truth": np.asarray(hr)[None]},
            psnr={"model": np.array([vals["model"][0]]),
                  "bicubic": np.array([vals["bicubic"][0]]),
                  "LR": np.array([-1.0]), "ground truth": np.array([np.inf])},
            ssim={"model": np.array([vals["model"][1]]),
                  "bicubic": np.array([vals["bicubic"][1]]),
                  "LR": np.array([-1.0]), "ground truth": np.array([1.0])})
        rendering.combine_halfs(np.asarray(sr), np.asarray(bic), "sr",
                                gal_dir, f"{name}_half")


def _calibrated_lp(extractor_path, calib):
    """LearnedPerceptualLoss with loss_weight set so the perceptual term
    equals the pixel-MSE magnitude at the GAN stage's starting point (the
    warm-start model's own outputs): training dynamics then match the
    proven-stable pixel-anchored recipe while the objective is the
    SR-pretrained feature space (losses/learned_perceptual.py)."""
    from simplesr_tpu.losses import LearnedPerceptualLoss
    from simplesr_tpu.train.serialization import load_model

    lr_v, hr_v = calib
    module, variables = load_model(extractor_path)
    sr0 = module.apply(variables, jnp.asarray(lr_v), train=False)
    mse0 = float(jnp.mean((jnp.asarray(hr_v) - sr0) ** 2))
    lp = LearnedPerceptualLoss(model_path=extractor_path)
    lp_raw = float(lp(hr_v, sr0, None, None)[0])
    weight = mse0 / max(lp_raw, 1e-12)
    print(f"[srgan_lp] calibration: mse0={mse0:.5f} lp_raw={lp_raw:.5f} "
          f"-> loss_weight={weight:.5f}", flush=True)
    return LearnedPerceptualLoss(model_path=extractor_path,
                                 loss_weight=weight)


def build_model(arch, tmp, patience, steps_hint, resnet_checkpoint=None,
                tiny=False, lp_extractor=None, lp_calib=None,
                pretrained_path=None):
    schedule = piecewise_constant_decay(
        [steps_hint // 2, (3 * steps_hint) // 4], [2e-4, 1e-4, 5e-5])
    lr_dims = (CROP // SCALE, CROP // SCALE)
    size = dict(num_blocks=2, num_filters=16) if tiny else {}
    # --remat (jax.checkpoint'd trunk blocks, docs/training.md) is passed
    # explicitly to every factory below, NOT stuffed into `size`, so the
    # tiny/full sizing expressions stay independent of global knobs
    if arch == "srresnet":
        gen = Generator.srresnet(upsample_factor=SCALE, batch_norm=False,
                                 input_dims=lr_dims, remat=REMAT, **size)
    elif arch == "srresnet128":
        # lane-filling variant (docs/performance.md: C=128 fills both MXU
        # dimensions — 155 vs 53 TFLOP/s trunk); tiny smoke runs keep the
        # reduced filter count so the smoke path stays light
        gen = Generator.srresnet(upsample_factor=SCALE, batch_norm=False,
                                 input_dims=lr_dims, remat=REMAT,
                                 **(size or dict(num_filters=128)))
    elif arch == "rrdb":
        gen = Generator.rrdb(upsample_factor=SCALE, input_dims=lr_dims,
                             remat=REMAT,
                             **(size or dict(num_blocks=RRDB_BLOCKS)))
    elif arch == "rrdb_wide":
        # lane-filled RRDB (VERDICT r2: 32-ch dense convs are 1/4 MXU lane
        # fill): nf=128 trunk, growth=128 dense convs (full 128-lane fill),
        # 2 blocks — measured 49.7 MPix/s ×4 inference vs the 16-block nf=64
        # baseline's 21.7 (2.29×) at MORE FLOPs (scripts note in
        # docs/performance.md).
        gen = Generator.rrdb(upsample_factor=SCALE, input_dims=lr_dims,
                             remat=REMAT,
                             **(size or dict(num_filters=128,
                                             growth_channels=128,
                                             num_blocks=2)))
    elif arch == "srgan":
        gen = Generator.srgan_generator(
            upsample_factor=SCALE, vgg_loss=False, batch_norm=False,
            adversarial_loss_weight=1e-3, input_dims=lr_dims, remat=REMAT,
            pretrained_model_path=pretrained_path, **size)
        disc = Discriminator.initialize_standard(
            label_smoothing=True, smoothing_offset=0.2,
            input_dims=(CROP, CROP),
            **(dict(num_filters=8) if tiny else {}))
        return SRModel(model_type="gan", generator=gen,
                       generator_optimizer="Adam",
                       generator_optimizer_config={"learning_rate": 1e-4},
                       discriminator=disc, discriminator_optimizer="Adam",
                       discriminator_optimizer_config={"learning_rate": 1e-4},
                       resnet_checkpoint=resnet_checkpoint,
                       config=_cfg(tmp, 10**6), paired_ways=_paired_for(arch))
    elif arch == "srgan_lp":
        # SRGAN with the measured perceptual substitute (VERDICT r2 #4c):
        # the paper's ImageNet-VGG term is impossible here (zero egress), so
        # the perceptual space is the pixel-pretrained SRResNet's own trunk
        # (extractor = the stage-1 model this GAN warm-starts from), with
        # the weight calibrated to the pixel-MSE scale at initialization.
        from simplesr_tpu.losses import AdversarialLoss
        lp = _calibrated_lp(lp_extractor, lp_calib)
        gen = Generator(
            upsample_factor=SCALE, architecture="srresnet",
            loss_functions=[lp, AdversarialLoss(weighted=True,
                                                loss_weight=1e-3)],
            batch_norm=False, input_dims=lr_dims, remat=REMAT,
            pretrained_model_path=pretrained_path, **size)
        disc = Discriminator.initialize_standard(
            label_smoothing=True, smoothing_offset=0.2,
            input_dims=(CROP, CROP),
            **(dict(num_filters=8) if tiny else {}))
        return SRModel(model_type="gan", generator=gen,
                       generator_optimizer="Adam",
                       generator_optimizer_config={"learning_rate": 1e-4},
                       discriminator=disc, discriminator_optimizer="Adam",
                       discriminator_optimizer_config={"learning_rate": 1e-4},
                       resnet_checkpoint=resnet_checkpoint,
                       config=_cfg(tmp, 10**6), paired_ways=_paired_for(arch))
    elif arch == "esrgan_lp":
        # ESRGAN with the paper's three-term STRUCTURE (perceptual-dominant
        # + 1e-2 L1 + 5e-3 RaGAN, reference model_builder-equivalent recipe)
        # where the unavailable ImageNet-VGG term is replaced by the
        # calibrated SR-trunk perceptual space. Contrast with "esrgan",
        # the pixel-anchored fallback documented below.
        from simplesr_tpu.losses import MeanAbsoluteError, RaAdversarialLoss
        lp = _calibrated_lp(lp_extractor, lp_calib)
        gen = Generator(
            upsample_factor=SCALE, architecture="rrdb",
            loss_functions=[
                MeanAbsoluteError(weighted=True, loss_weight=1e-2),
                RaAdversarialLoss(weighted=True, loss_weight=5e-3),
                lp,
            ],
            residual_scaling=0.2, batch_norm=False, input_dims=lr_dims,
            pretrained_model_path=pretrained_path, remat=REMAT,
            **(size or dict(num_blocks=RRDB_BLOCKS)))
        disc = Discriminator.initialize_relativistic(
            input_dims=(CROP, CROP),
            **(dict(num_filters=8) if tiny else {}))
        return SRModel(model_type="gan", generator=gen,
                       generator_optimizer="Adam",
                       generator_optimizer_config={"learning_rate": 1e-4},
                       discriminator=disc, discriminator_optimizer="Adam",
                       discriminator_optimizer_config={"learning_rate": 1e-4},
                       resnet_checkpoint=resnet_checkpoint,
                       config=_cfg(tmp, 10**6), paired_ways=_paired_for(arch))
    elif arch == "esrgan":
        # ESRGAN-style RRDB+RaGAN stage. The paper weights (1e-2 L1 + 5e-3
        # RaAdv + VGG@1) are degenerate without the VGG term (no ImageNet
        # weights exist in this environment — README "Weights note"): the
        # adversarial term out-weighs the pixel anchor 1:2 and the generator
        # collapses to a constant within one epoch (measured). With the
        # perceptual term gone the pixel anchor takes its place at weight
        # 1.0, mirroring the stable SRGAN ratio.
        from simplesr_tpu.losses import MeanAbsoluteError, RaAdversarialLoss
        gen = Generator(
            upsample_factor=SCALE, architecture="rrdb",
            loss_functions=[
                MeanAbsoluteError(weighted=True, loss_weight=1.0),
                RaAdversarialLoss(weighted=True, loss_weight=5e-3),
            ],
            residual_scaling=0.2, batch_norm=False, input_dims=lr_dims,
            remat=REMAT, pretrained_model_path=pretrained_path,
            **(size or dict(num_blocks=RRDB_BLOCKS)))
        disc = Discriminator.initialize_relativistic(
            input_dims=(CROP, CROP),
            **(dict(num_filters=8) if tiny else {}))
        return SRModel(model_type="gan", generator=gen,
                       generator_optimizer="Adam",
                       generator_optimizer_config={"learning_rate": 1e-4},
                       discriminator=disc, discriminator_optimizer="Adam",
                       discriminator_optimizer_config={"learning_rate": 1e-4},
                       resnet_checkpoint=resnet_checkpoint,
                       config=_cfg(tmp, 10**6), paired_ways=_paired_for(arch))
    else:
        raise ValueError(arch)
    return SRModel(model_type="resnet", generator=gen,
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": schedule},
                   config=_cfg(tmp, patience), distill=DISTILL,
                   paired_ways=_paired_for(arch))


RRDB_BLOCKS = 8   # --rrdb-blocks; 8 fits the corpus, 16+ = paper capacity
MAX_EPOCHS = 120  # --epochs
REMAT = False     # --remat; memory headroom for deep/wide stages
DISTILL = None    # --distill teacher.msgpack[:weight] — pixel stages train
                  # with the frozen-teacher term (train/distill.py); pair
                  # with --out so distilled results land in their own dir
PAIRED = None     # --paired W: train SRResNet-family stages (srresnet,
                  # srresnet128, srgan, srgan_lp) in the packed batch->
                  # channel layout (train/paired.py) — exact, ~1.3-1.4x
                  # faster steps; RRDB stages are unaffected


def _paired_for(arch):
    """paired_ways for SRModel: SRResNet-family BN-free stages only."""
    if PAIRED and arch in ("srresnet", "srresnet128", "srgan", "srgan_lp"):
        return PAIRED
    return None


def main(fast=False, tiny=False, pixel_archs=("srresnet", "rrdb"),
         gan_pairs=(("srgan", "srresnet"), ("esrgan", "rrdb"))):
    os.makedirs(os.path.join(OUT_DIR, "models"), exist_ok=True)
    max_epochs = 3 if fast else MAX_EPOCHS
    patience = 10**6 if fast else 8
    gan_epochs = 2 if fast else 25

    print("staging dataset on device...", flush=True)
    train, val = stage_dataset(crops_per_mpix=12 if fast else 96,
                               val_crops_per_img=16 if fast else 32)
    steps_hint = (train[0].shape[0] // BATCH) * max_epochs
    print(f"{train[0].shape[0]} train pairs, {val[0].shape[0]} val pairs, "
          f"{train[0].shape[0] // BATCH} steps/epoch", flush=True)

    # merge into an existing results file so subset runs (--pixel / --gan)
    # append to the campaign table instead of clobbering it
    results = {"scale": SCALE, "train_imgs": list(TRAIN_IMGS),
               "heldout_imgs": list(HELDOUT_IMGS)}
    results_path = os.path.join(OUT_DIR, "RESULTS.json")
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = {**json.load(f), **results}
    ckpt_dirs = {}

    import traceback
    for arch in pixel_archs:
        tmp = tempfile.mkdtemp(prefix=f"campaign_{arch}_")
        model = build_model(arch, tmp, patience, steps_hint, tiny=tiny)
        print(f"=== training {arch} x{SCALE} ===", flush=True)
        run_training(model, train, val, max_epochs, arch)
        # save FIRST: a gallery/eval failure must not lose the trained model
        saved = model.save_model(os.path.join(OUT_DIR, "models"),
                                 postfix=f"{arch}_x{SCALE}_best")
        ckpt_dirs[arch] = os.path.join(tmp, "ckpt", "resnet")
        print(f"[{arch}] saved {saved}", flush=True)
        try:
            evaluate(model, arch, results)
            render_galleries(model, arch)
        except Exception:
            traceback.print_exc()
        with open(os.path.join(OUT_DIR, "RESULTS.json"), "w") as f:
            json.dump(results, f, indent=2)

    # two-stage runs: warm-start each GAN from its pixel-pretrained parent.
    # Parent "r2:<arch>" reuses the committed round-2 model
    # (results/quality_r2/models/resnet_gen_<arch>_x{SCALE}_best.msgpack)
    # instead of a same-run pretrain — the GAN then compares directly
    # against round-2 stages that share the exact same starting point.
    r2_models = os.path.join(os.path.dirname(OUT_DIR.rstrip("/")),
                             "quality_r2", "models")
    for arch, parent in gan_pairs:
        ckpt, pretrained = None, None
        if parent.startswith("r2:"):
            pretrained = os.path.join(
                r2_models, f"resnet_gen_{parent[3:]}_x{SCALE}_best.msgpack")
            if not os.path.exists(pretrained):
                print(f"[{arch}] skipped: no committed {pretrained}",
                      flush=True)
                continue
        elif parent.startswith("out:"):
            # warm-start from a pixel model saved by an earlier invocation
            # into THIS campaign's OUT_DIR (lets GAN stages resume after an
            # interrupted run without retraining the parent)
            pretrained = os.path.join(
                OUT_DIR, "models",
                f"resnet_gen_{parent[4:]}_x{SCALE}_best.msgpack")
            if not os.path.exists(pretrained):
                print(f"[{arch}] skipped: no saved {pretrained}", flush=True)
                continue
        elif parent in ckpt_dirs:
            ckpt = ckpt_dirs[parent]
        else:
            print(f"[{arch}] skipped: no {parent} pretrain in this run",
                  flush=True)
            continue
        tmp = tempfile.mkdtemp(prefix=f"campaign_{arch}_")
        lp_kw = {}
        if arch in ("srgan_lp", "esrgan_lp"):
            # extractor = the stage-1 model this GAN warm-starts from;
            # calibration batch = first val pairs (never held-out images)
            extractor = pretrained or os.path.join(
                OUT_DIR, "models",
                f"resnet_gen_{parent}_x{SCALE}_best.msgpack")
            lp_kw = dict(lp_extractor=extractor,
                         lp_calib=(val[0][:BATCH], val[1][:BATCH]))
        model = build_model(arch, tmp, patience, steps_hint,
                            resnet_checkpoint=ckpt, tiny=tiny,
                            pretrained_path=pretrained, **lp_kw)
        print(f"=== training {arch} x{SCALE} (pretrain warm start) ===",
              flush=True)
        run_training(model, train, val, gan_epochs, arch)
        saved = model.save_model(os.path.join(OUT_DIR, "models"),
                                 postfix=f"{arch}_x{SCALE}_final")
        print(f"[{arch}] saved {saved}", flush=True)
        try:
            evaluate(model, arch, results)
            render_galleries(model, arch)
        except Exception:
            traceback.print_exc()
        with open(os.path.join(OUT_DIR, "RESULTS.json"), "w") as f:
            json.dump(results, f, indent=2)

    _write_markdown(results)
    print("campaign complete", flush=True)


def _write_markdown(results):
    import statistics

    model_labels = [k for k in results
                    if k not in ("scale", "train_imgs", "heldout_imgs")]
    lines = [
        f"# Quality results ({os.path.basename(OUT_DIR.rstrip('/'))} campaign)",
        "",
        f"x{SCALE} super-resolution trained to convergence (early-stopped) on "
        "every real photo available in this zero-egress environment "
        f"({', '.join(results['train_imgs'])}); held-out probes never seen "
        f"during training or model selection: {', '.join(results['heldout_imgs'])}.",
        "",
        "Produced by `scripts/quality_campaign.py`; galleries under "
        "`galleries/`, model files under `models/`. Metrics on [-1,1] "
        "tensors, max_val=2.0 (reference convention). `LP` is the learned-"
        "perceptual feature distance (lower is better) in this campaign's "
        "srresnet-trunk space — comparable only within this table.",
        "",
        "## Held-out summary (mean ± stdev over the held-out set)",
        "",
        "| model | n | PSNR | ΔPSNR vs bicubic | SSIM | LP (bicubic LP) | images below bicubic PSNR |",
        "|---|---|---|---|---|---|---|",
    ]
    for label in model_labels:
        rows = {n: r for n, r in results[label].items() if r["heldout"]}
        if not rows:
            continue
        p = [r["model"]["psnr"] for r in rows.values()]
        bp = [r["bicubic"]["psnr"] for r in rows.values()]
        s = [r["model"]["ssim"] for r in rows.values()]
        losers = sorted(n for n, r in rows.items()
                        if r["model"]["psnr"] < r["bicubic"]["psnr"])
        spread = statistics.stdev(p) if len(p) > 1 else 0.0
        lp_cell = "—"
        if all("lp" in r["model"] for r in rows.values()):
            lp = sum(r["model"]["lp"] for r in rows.values()) / len(rows)
            blp = sum(r["bicubic"]["lp"] for r in rows.values()) / len(rows)
            lp_cell = f"{lp:.4f} ({blp:.4f})"
        lines.append(
            f"| {label} | {len(p)} | {sum(p)/len(p):.3f} ± {spread:.3f} "
            f"| {sum(p)/len(p) - sum(bp)/len(bp):+.3f} "
            f"| {sum(s)/len(s):.4f} | {lp_cell} "
            f"| {', '.join(losers) if losers else 'none'} |")
    lines += [
        "",
        "## Per-image detail",
        "",
        "Rows where the model loses to bicubic on PSNR are flagged explicitly.",
        "",
        "| model | image | | PSNR | PSNR-Y | SSIM | LP |",
        "|---|---|---|---|---|---|---|",
    ]
    for label in model_labels:
        for name, row in results[label].items():
            tag = "held-out" if row["heldout"] else "train-member"
            m, b = row["model"], row["bicubic"]
            flag = " **(< bicubic)**" if m["psnr"] < b["psnr"] else ""
            lines.append(f"| {label} | {name} ({tag}) | model | {m['psnr']}{flag} "
                         f"| {m['psnr_y']} | {m['ssim']} | {m.get('lp', '—')} |")
            lines.append(f"| | | bicubic | {b['psnr']} | {b['psnr_y']} "
                         f"| {b['ssim']} | {b.get('lp', '—')} |")
    with open(os.path.join(OUT_DIR, "RESULTS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _parse_cli(argv):
    """--scale N (4 switches to 128px crops + results/quality_r2_x4, the
    runs committed under that directory), --pixel a[,b...],
    --gan gan:parent[,...] to run subsets."""
    global SCALE, CROP, OUT_DIR
    kwargs = {"fast": "--fast" in argv or "--tiny" in argv,
              "tiny": "--tiny" in argv}
    if "--no-gallery-corpus" in argv:  # pre-round-4 3-image corpus
        for k in [k for k, v in TRAIN_IMGS.items() if v.startswith(_GALLERY_DIR)]:
            del TRAIN_IMGS[k]
        # gallery tiles leave the game entirely: held-out reverts to the
        # pre-round-4 2-probe split as well
        for k in HELDOUT_GALLERY:
            HELDOUT_IMGS.pop(k, None)
    elif "--legacy-holdout" in argv:
        # pre-round-5 split: gallery tiles all train, held-out = 2 probes
        # (only for comparing against pre-r5 campaign numbers)
        for k in HELDOUT_GALLERY:
            path = HELDOUT_IMGS.pop(k, None)
            if path:
                TRAIN_IMGS[k] = path
    if "--scale" in argv:
        SCALE = int(argv[argv.index("--scale") + 1])
        if SCALE not in (2, 4, 8):
            raise SystemExit(f"--scale must be 2, 4, or 8, got {SCALE}")
        CROP = 96 if SCALE == 2 else 128
        if SCALE != 2:
            OUT_DIR = OUT_DIR.rstrip("/") + f"_x{SCALE}"
    global BATCH
    if "--crop" in argv:  # e.g. the EDSR-style 192-crop production recipe
        CROP = int(argv[argv.index("--crop") + 1])
        if CROP % SCALE:
            raise SystemExit(f"--crop {CROP} must divide scale {SCALE}")
    if "--batch" in argv:
        BATCH = int(argv[argv.index("--batch") + 1])
    if "--out" in argv:  # e.g. smoke runs — don't merge into committed results
        OUT_DIR = argv[argv.index("--out") + 1]
    global RRDB_BLOCKS, MAX_EPOCHS, REMAT, DISTILL, PAIRED
    if "--remat" in argv:
        REMAT = True
    if "--paired" in argv:
        PAIRED = int(argv[argv.index("--paired") + 1])
        if PAIRED < 2:
            raise SystemExit(f"--paired must be >= 2, got {PAIRED}")
        if BATCH % PAIRED:
            raise SystemExit(f"--paired {PAIRED} must divide batch {BATCH}")
    if "--distill" in argv:
        spec = argv[argv.index("--distill") + 1]
        path, weight = spec, 1.0
        if ":" in spec:
            head, tail = spec.rsplit(":", 1)
            try:
                weight = float(tail)
                path = head
            except ValueError:
                pass  # no numeric tail — the whole spec is the path
        if not os.path.exists(path):  # fail BEFORE hours of training
            raise SystemExit(f"--distill teacher not found: {path}")
        DISTILL = {"model": path, "weight": weight}
    if "--rrdb-blocks" in argv:
        RRDB_BLOCKS = int(argv[argv.index("--rrdb-blocks") + 1])
    if "--epochs" in argv:
        MAX_EPOCHS = int(argv[argv.index("--epochs") + 1])
    if "--pixel" in argv:
        spec = argv[argv.index("--pixel") + 1]
        kwargs["pixel_archs"] = () if spec in ("none", "") else \
            tuple(spec.split(","))
    if "--gan" in argv:
        spec = argv[argv.index("--gan") + 1]
        if spec in ("none", ""):
            kwargs["gan_pairs"] = ()
        else:
            # parent may itself be namespaced ("r2:srresnet") — split once
            pairs = tuple(tuple(p.split(":", 1)) for p in spec.split(","))
            bad = [":".join(p) for p in pairs if len(p) != 2]
            if bad:  # fail BEFORE hours of pixel training, not after
                raise SystemExit(
                    f"--gan entries must be gan:parent, got {bad}")
            kwargs["gan_pairs"] = pairs
    return kwargs


if __name__ == "__main__":
    main(**_parse_cli(sys.argv[1:]))
