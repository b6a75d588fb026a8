"""Train-step roofline: where do the milliseconds of the fused SRResNet x4
train step go, and what do batch / crop / BatchNorm / dtype buy?

The inference path got a measured roofline (docs/performance.md); this is
the training-side counterpart the bench's one number
(srresnet_x4_train_ms_per_step_b16) can't answer. For every config the
FULL production step (SRModel._build_train_step — grad + Adam + EMA +
metrics, state donated) is compiled, timed over chained steps with ONE
value-fetch fence (dev-tunnel methodology, bench.py), and scored as
effective TFLOP/s from XLA's own cost analysis of the compiled executable.
A forward-only apply at identical shapes is timed alongside, so the
fwd : (bwd+opt) split is measured, not guessed.

Reference hot loop being modeled: the reference trains via
model.train_step per batch (/root/reference/simple_sr/operations/
training.py:46-49) at batch 16, 96^2 HR crops (its YAML examples).

Run on the TPU chip:
    python scripts/train_roofline.py [--steps 30] [--out results/train_roofline]
Emits a markdown table + JSON; docs/performance.md cites the results.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TFLOPS_BF16 = 197.0  # v5e MXU peak; bench.py calibration hits 165


def _cfg(tmp):
    class Cfg:
        model_dir = tmp + "/m"
        checkpoint_dir = tmp + "/c"
        early_stop_metric = "psnr"
        early_stop_patience = 10**6
        epoch_train_summary_writer = None
        batch_train_summary_writer = None
        epoch_validation_summary_writer = None
        batch_validation_summary_writer = None
    return Cfg


def _flops(jitted, *args):
    import jax
    try:
        if not hasattr(jitted, "lower"):
            jitted = jax.jit(jitted)
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def measure_config(batch, crop, scale=4, batch_norm=True, dtype=None,
                   steps=30):
    """One (batch, crop, bn, dtype) point → dict of measured numbers."""
    import jax
    import jax.numpy as jnp
    from simplesr_tpu.train import Generator, SRModel

    tmp = tempfile.mkdtemp()
    lr_hw = crop // scale
    gen = Generator.srresnet(upsample_factor=scale, batch_norm=batch_norm,
                             dtype=dtype, input_dims=(lr_hw, lr_hw))
    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-4},
                    config=_cfg(tmp))
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (batch, lr_hw, lr_hw, 3)), jnp.float32)
    hr = jnp.asarray(rng.uniform(-1, 1, (batch, crop, crop, 3)), jnp.float32)

    def fence():
        jax.block_until_ready(model.state.g_params)
        float(np.asarray(jax.tree_util.tree_leaves(
            model.state.g_params)[0]).ravel()[0])

    # full production step (state donated inside SRModel)
    model.train_step(lr, hr)  # compile
    model.after_train_batch()
    fence()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            model.train_step(lr, hr)
            model.after_train_batch()
        fence()
        best = min(best, (time.perf_counter() - t0) / steps)
    step_ms = best * 1000.0
    step_flops = _flops(model._train_step_fn, model.state, lr, hr)

    # forward-only at the same shapes (train=True statistics path when BN)
    module = gen.model()
    variables = {"params": model.state.g_params}
    if model.state.g_batch_stats:
        variables["batch_stats"] = model.state.g_batch_stats

    @jax.jit
    def fwd(v, x):
        return module.apply(v, x, train=False)

    out = fwd(variables, lr)
    jax.block_until_ready(out)
    fbest = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fwd(variables, lr)
        float(jnp.sum(out))
        fbest = min(fbest, (time.perf_counter() - t0) / steps)
    fwd_ms = fbest * 1000.0
    fwd_flops = _flops(fwd, variables, lr)

    row = {
        "batch": batch, "crop": crop, "batch_norm": batch_norm,
        "dtype": str(jnp.dtype(dtype)) if dtype else "policy-bf16",
        "step_ms": round(step_ms, 3),
        "fwd_ms": round(fwd_ms, 3),
        "bwd_opt_ms": round(step_ms - fwd_ms, 3),
        "hr_mpix_per_s": round(batch * crop * crop / 1e6 / (step_ms / 1e3), 2),
    }
    if step_flops:
        tf = step_flops / (step_ms / 1e3) / 1e12
        row["step_tflops"] = round(tf, 1)
        row["step_mxu_util"] = round(tf / PEAK_TFLOPS_BF16, 3)
    if fwd_flops:
        row["fwd_tflops"] = round(fwd_flops / (fwd_ms / 1e3) / 1e12, 1)
    return row


def equal_pixels_control(steps=30):
    """Forward-only at EQUAL total LR pixels but different batch/spatial
    splits — separates "small 24² spatials starve the MXU" (false) from
    "too little total work per step" (true). Measured (v5e): 16×24² 15.3
    TFLOP/s > 4×48² 14.2 > 1×96² 11.2 — the recipe's batched-small-crop
    layout is already the best split; only MORE work helps (16×96²:
    22.2)."""
    import jax
    import jax.numpy as jnp
    from simplesr_tpu.train import Generator

    rows = []
    for batch, lr_hw in [(16, 24), (4, 48), (1, 96), (16, 96)]:
        gen = Generator.srresnet(upsample_factor=4, batch_norm=True,
                                 input_dims=(lr_hw, lr_hw))
        module = gen.model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (batch, lr_hw, lr_hw, 3)),
                        jnp.float32)
        variables = module.init(jax.random.key(0), x, train=False)

        @jax.jit
        def fwd(v, x):
            return module.apply(v, x, train=False)

        out = fwd(variables, x)
        jax.block_until_ready(out)
        flops = _flops(fwd, variables, x)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fwd(variables, x)
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / steps)
        row = {"batch": batch, "lr_hw": lr_hw,
               "lr_pixels": batch * lr_hw * lr_hw,
               "fwd_ms": round(best * 1000, 3)}
        if flops:
            row["fwd_tflops"] = round(flops / best / 1e12, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--out", default="results/train_roofline")
    p.add_argument("--fast", action="store_true",
                   help="2 configs, 5 steps (smoke)")
    p.add_argument("--equal-pixels", action="store_true",
                   help="run only the equal-pixels spatial control")
    args = p.parse_args(argv)
    steps = 5 if args.fast else args.steps

    if args.equal_pixels:
        rows = equal_pixels_control(steps=steps)
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "EQUAL_PIXELS.json"), "w") as f:
            json.dump(rows, f, indent=1)
        return 0

    sweep = [
        # the bench/paper point and its neighbourhood
        dict(batch=16, crop=96),
        dict(batch=32, crop=96),
        dict(batch=64, crop=96),
        dict(batch=16, crop=128),
        dict(batch=32, crop=128),
        dict(batch=16, crop=192),
        dict(batch=32, crop=192),
        # ablations at the paper point
        dict(batch=16, crop=96, batch_norm=False),
        dict(batch=64, crop=192),
        dict(batch=64, crop=192, batch_norm=False),
    ]
    if args.fast:
        sweep = [dict(batch=2, crop=32), dict(batch=2, crop=32,
                                              batch_norm=False)]

    rows = []
    for cfg in sweep:
        row = measure_config(steps=steps, **cfg)
        rows.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "RESULTS.json"), "w") as f:
        json.dump(rows, f, indent=1)

    cols = ["batch", "crop", "batch_norm", "step_ms", "fwd_ms", "bwd_opt_ms",
            "hr_mpix_per_s", "step_tflops", "step_mxu_util", "fwd_tflops"]
    lines = ["| " + " | ".join(cols) + " |",
             "|" + "---|" * len(cols)]
    for r in rows:
        lines.append("| " + " | ".join(str(r.get(c, "")) for c in cols) + " |")
    md = "\n".join(lines) + "\n"
    with open(os.path.join(args.out, "RESULTS.md"), "w") as f:
        f.write("# SRResNet x4 fused train step roofline\n\n" + md)
    print(md)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
