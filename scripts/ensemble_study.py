"""Measure the ×8 geometric self-ensemble: held-out quality gain + cost.

For each trained model in results/, SR the held-out probes (baboon, comic —
never in any training pool) plain and under the ensemble, and report
PSNR/PSNR-Y/SSIM deltas; then measure the throughput cost with the
bench.py chained-jit methodology (the axon tunnel makes per-call wall
timing meaningless).

Run: python scripts/ensemble_study.py [--out results/quality_r3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HELDOUT = [
    "/root/reference/tests/data/baboon.png",
    "/root/reference/tests/data/comic.png",
]

MODELS = {  # name -> (path, scale)
    "srresnet_x2": ("results/quality_r2/models/resnet_gen_srresnet_x2_best.msgpack", 2),
    "srresnet128_x2": ("results/quality_r2/models/resnet_gen_srresnet128_x2_best.msgpack", 2),
    "rrdb_wide_x2": ("results/quality_r3/models/resnet_gen_rrdb_wide_x2_best.msgpack", 2),
    "srresnet128_x4": ("results/quality_r2_x4/models/resnet_gen_srresnet128_x4_best.msgpack", 4),
    "rrdb_x4": ("results/quality_r2_x4_deep/models/resnet_gen_rrdb_x4_best.msgpack", 4),
}


def _even_crop(img, scale):
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale]


def eval_model(path, scale):
    import jax
    import jax.numpy as jnp
    from simplesr_tpu.data import read_img
    from simplesr_tpu.eval.evaluation import _as_predictor
    from simplesr_tpu.ops import resize, psnr, psnr_on_y, ssim, self_ensemble

    predict = _as_predictor(path, fast=True)
    rows = []
    for probe in HELDOUT:
        hr = _even_crop(read_img(probe) / 255.0, scale)
        h, w = hr.shape[:2]
        lr = resize(jnp.asarray(hr, jnp.float32)[None],
                    (h // scale, w // scale), method="bicubic",
                    antialias=True)
        hr11 = jnp.asarray(hr * 2.0 - 1.0, jnp.float32)[None]

        out_plain = predict(lr)
        out_ens = self_ensemble(predict, lr)
        row = {"probe": os.path.basename(probe)}
        for tag, out in (("plain", out_plain), ("ens", out_ens)):
            out = jnp.clip(out.astype(jnp.float32), -1.0, 1.0)
            row[f"psnr_{tag}"] = float(psnr(hr11, out, max_val=2.0)[0])
            row[f"psnr_y_{tag}"] = float(psnr_on_y(hr11, out, max_val=2.0)[0])
            row[f"ssim_{tag}"] = float(ssim(hr11, out, max_val=2.0)[0])
        row["dpsnr"] = row["psnr_ens"] - row["psnr_plain"]
        rows.append(row)
    return rows


def measure_cost(path, scale, batch=8, lr_hw=128, chain=10):
    """Output MPix/s plain vs ensembled, chained inside one jit."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from simplesr_tpu.eval.evaluation import _as_predictor
    from simplesr_tpu.ops import self_ensemble

    predict = _as_predictor(path, fast=True)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (batch, lr_hw, lr_hw, 3)), jnp.float32)

    def timed(fn):
        @jax.jit
        def chain_fn(x, n):
            def body(i, x):
                out = fn(x)
                return x * 0.999 + 1e-6 * out[:, ::scale, ::scale, :]
            return jnp.sum(lax.fori_loop(0, n, body, x))

        float(chain_fn(x0, 1))
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            float(chain_fn(x0, chain))
            dt = time.perf_counter() - t0
            best = max(best, batch * (lr_hw * scale) ** 2 * chain / 1e6 / dt)
        return best

    plain = timed(predict)
    ens = timed(lambda x: self_ensemble(predict, x))
    return plain, ens


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="results/quality_r3")
    p.add_argument("--cost-model", default="srresnet_x2",
                   help="model used for the throughput-cost measurement")
    args = p.parse_args(argv)

    report = {"models": {}, "cost": {}}
    for name, (path, scale) in MODELS.items():
        if not os.path.exists(path):
            print(f"skip {name}: {path} missing")
            continue
        rows = eval_model(path, scale)
        report["models"][name] = rows
        for r in rows:
            print(f"{name:16s} {r['probe']:12s} "
                  f"psnr {r['psnr_plain']:.3f} -> {r['psnr_ens']:.3f} "
                  f"({r['dpsnr']:+.3f} dB)  "
                  f"ssim {r['ssim_plain']:.4f} -> {r['ssim_ens']:.4f}")

    cpath, cscale = MODELS[args.cost_model]
    if os.path.exists(cpath):
        plain, ens = measure_cost(cpath, cscale)
        report["cost"] = {"model": args.cost_model, "plain_mpix_s": plain,
                          "ensemble_mpix_s": ens,
                          "cost_factor": plain / max(ens, 1e-9)}
        print(f"cost [{args.cost_model}]: plain {plain:.1f} MPix/s, "
              f"ensemble {ens:.1f} MPix/s ({plain / ens:.1f}x)")

    os.makedirs(args.out, exist_ok=True)
    out = os.path.join(args.out, "ENSEMBLE.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
