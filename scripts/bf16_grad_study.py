"""bf16-GRADIENT study: the backward-side counterpart of the
bf16-activation study (docs/performance.md).

The fused step already computes conv gradients in bf16 (the forward policy
makes the cotangents bf16); what stays f32 is the MATERIALIZED gradient
tree handed to Adam, and Adam's moments. Two levers mirror what large-scale
DP/FSDP deployments quantize:

  grads_bf16 — round-trip the gradient tree through bf16 before the
      optimizer. On one chip this measures the pure quantization effect;
      on a pod it is the precision the gradient all-reduce would run at
      (half the ICI bytes of f32).
  mu_bf16 — store Adam's first moment in bf16 (optax mu_dtype): half the
      moment memory, the FSDP/ZeRO memory lever.

For each variant this script measures (a) step time of the production
recipe (BN-free SRResNet ×4, b16×96² — bench.py's train row), and (b)
QUALITY: a real ×2 training run on the div2k+lena corpus, reporting the
validation-PSNR trajectory against the f32 control. The interesting
question is (b): whether bf16 gradient quantization costs SR quality —
(a) is expected ~neutral single-chip since the conv work is bf16 already.

Run on the TPU chip:
    python scripts/bf16_grad_study.py [--steps 30] [--epochs 25]
        [--out results/bf16_grad_study]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _cast_grads(dtype):
    """optax transform: round-trip incoming updates through `dtype`."""
    import jax
    import jax.numpy as jnp
    import optax

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        upd = jax.tree_util.tree_map(
            lambda g: g.astype(dtype).astype(jnp.float32), updates)
        return upd, state

    return optax.GradientTransformation(init, update)


def _make_tx(variant, lr=1e-4):
    import jax.numpy as jnp
    import optax

    if variant == "f32":
        return optax.adam(lr)
    if variant == "grads_bf16":
        return optax.chain(_cast_grads(jnp.bfloat16), optax.adam(lr))
    if variant == "mu_bf16":
        return optax.adam(lr, mu_dtype=jnp.bfloat16)
    if variant == "grads+mu_bf16":
        return optax.chain(_cast_grads(jnp.bfloat16),
                           optax.adam(lr, mu_dtype=jnp.bfloat16))
    raise ValueError(variant)


VARIANTS = ("f32", "grads_bf16", "mu_bf16", "grads+mu_bf16")


def _train_setup(scale, crop, batch, seed=0):
    import jax
    import jax.numpy as jnp
    from simplesr_tpu.models.srresnet import SRResNet

    mod = SRResNet(upsample_factor=scale, num_filters=64, num_res_blocks=16,
                   batch_norm=False)
    lr_hw = crop // scale
    x0 = jnp.zeros((1, lr_hw, lr_hw, 3))
    params = mod.init(jax.random.key(seed), x0, train=True)["params"]
    return mod, params


def _step_fn(mod, tx):
    import jax
    import jax.numpy as jnp

    def loss(p, x, y):
        sr = jnp.asarray(mod.apply({"params": p}, x, train=True), jnp.float32)
        return jnp.mean((sr - y) ** 2)

    @jax.jit
    def step(p, s, x, y):
        import optax
        g = jax.grad(loss)(p, x, y)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    return step


def measure_step_time(variant, steps=30, crop=96, scale=4, batch=16):
    """ms/step of the production-shaped step under the variant optimizer."""
    import jax
    import jax.numpy as jnp

    mod, params = _train_setup(scale, crop, batch)
    tx = _make_tx(variant)
    opt = tx.init(params)
    step = _step_fn(mod, tx)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, crop // scale, crop // scale, 3)),
                    jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (batch, crop, crop, 3)), jnp.float32)
    params, opt = step(params, opt, x, y)  # compile
    float(jax.tree_util.tree_leaves(params)[0].astype(jnp.float32).sum())
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt = step(params, opt, x, y)
        float(jax.tree_util.tree_leaves(params)[0].astype(jnp.float32).sum())
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1000.0


def _corpus(scale=2, crop=96, n_train=1024, n_val=128):
    """Device-staged crop pairs from the real images (campaign recipe)."""
    import jax
    import jax.numpy as jnp
    from simplesr_tpu.data import read_img
    from simplesr_tpu.ops import batch_random_crops, resize

    paths = ["/root/reference/data/datasets/div2k/4/0004.png",
             "/root/reference/data/datasets/div2k/8/0006.png",
             "/root/reference/tests/data/lena.png"]
    parts_t, parts_v = [], []
    for i, p in enumerate(paths):
        img = jnp.asarray(read_img(p))
        parts_t.append(batch_random_crops(jax.random.key(100 + i), img[None],
                                          num_crops=n_train // len(paths),
                                          patch_size=(crop, crop)))
        parts_v.append(batch_random_crops(jax.random.key(200 + i), img[None],
                                          num_crops=n_val // len(paths),
                                          patch_size=(crop, crop)))

    def pairs(hr_u8):
        lr = resize(hr_u8 / 255.0, (crop // scale, crop // scale),
                    method="bicubic", antialias=True)
        return (jnp.asarray(lr, jnp.float32),
                jnp.asarray(hr_u8 / 127.5 - 1.0, jnp.float32))

    return pairs(jnp.concatenate(parts_t)), pairs(jnp.concatenate(parts_v))


def quality_run(variant, epochs=25, scale=2, crop=96, batch=16, seed=0):
    """Real training; returns the per-epoch validation PSNR trajectory."""
    import jax
    import jax.numpy as jnp
    from simplesr_tpu.ops import psnr

    (lr_t, hr_t), (lr_v, hr_v) = _corpus(scale=scale, crop=crop)
    mod, params = _train_setup(scale, crop, batch, seed=seed)
    tx = _make_tx(variant)
    opt = tx.init(params)
    step = _step_fn(mod, tx)

    @jax.jit
    def val_psnr(p):
        sr = jnp.asarray(mod.apply({"params": p}, lr_v, train=False),
                         jnp.float32)
        return jnp.mean(psnr(hr_v, sr, max_val=2.0))

    n = (lr_t.shape[0] // batch) * batch
    curve = []
    key = jax.random.key(7)
    for _ in range(epochs):
        key, sub = jax.random.split(key)
        order = jax.random.permutation(sub, lr_t.shape[0])[:n]
        for b in range(n // batch):
            idx = order[b * batch:(b + 1) * batch]
            params, opt = step(params, opt, lr_t[idx], hr_t[idx])
        curve.append(float(val_psnr(params)))
    return curve


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "bf16_grad_study"))
    ap.add_argument("--skip-quality", action="store_true")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    results = {"variants": {}}
    for v in VARIANTS:
        ms = measure_step_time(v, steps=args.steps)
        results["variants"][v] = {"ms_per_step_b16_crop96_x4": round(ms, 3)}
        print(f"[time] {v}: {ms:.3f} ms/step", flush=True)
    if not args.skip_quality:
        for v in VARIANTS:
            curve = quality_run(v, epochs=args.epochs)
            results["variants"][v]["val_psnr_curve_x2"] = [
                round(c, 3) for c in curve]
            results["variants"][v]["final_val_psnr_x2"] = round(curve[-1], 3)
            print(f"[quality] {v}: final val PSNR {curve[-1]:.3f} "
                  f"(best {max(curve):.3f})", flush=True)

    with open(os.path.join(args.out, "RESULTS.json"), "w") as f:
        json.dump(results, f, indent=2)

    lines = ["# bf16-gradient study", "",
             "Production-shaped step (BN-free SRResNet ×4, b16×96²) timing "
             "and a real ×2 training-quality comparison per optimizer-"
             "precision variant. See the module docstring for what each "
             "variant models (DP all-reduce precision / FSDP moment memory).",
             "",
             "| variant | ms/step (×4 b16×96²) | final val PSNR (×2) | best |",
             "|---|---|---|---|"]
    for v, r in results["variants"].items():
        c = r.get("val_psnr_curve_x2")
        lines.append(
            f"| {v} | {r['ms_per_step_b16_crop96_x4']} "
            f"| {r.get('final_val_psnr_x2', '—')} "
            f"| {max(c) if c else '—'} |")
    with open(os.path.join(args.out, "RESULTS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"written: {args.out}", flush=True)


if __name__ == "__main__":
    main()
