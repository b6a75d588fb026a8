"""Measure what trunk rematerialization buys: peak train-step memory.

For each (arch, remat) the FULL fused train step (SRModel._build_train_step
— the exact production step: grad + optax update + metrics) is lowered and
compiled, and XLA's own memory analysis is read back — no step executes, so
a whole sweep costs only compile time (~1 min/config on a warm cache, and
results land even on configs that would OOM if *run*).

Run on the TPU chip:   python scripts/remat_study.py [--batch 16] [--crop 128]
Add --steps N to also time N real steps per config (throughput cost of the
recompute). Emits a markdown table + one JSON line for docs/performance.md.

Why this exists: RRDB's dense concatenations hold ~(2 + num_convs/2)×width
channels live per dense block; at 23 blocks × 3 dense blocks that's the
activation bill that caps batch/depth long before the MXU is busy. remat
(models/rrdb.py / srresnet.py `remat=True`, YAML `model.generator.remat`)
recomputes each block in the backward pass instead: O(blocks)→O(1)
stored activations for ~one extra trunk forward of FLOPs.
"""

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")


def build_model(arch, remat, crop, scale, blocks):
    from simplesr_tpu.train import Generator, SRModel
    from bench import _train_cfg

    kw = dict(upsample_factor=scale, num_blocks=blocks,
              input_dims=(crop // scale, crop // scale), remat=remat)
    gen = Generator.rrdb(**kw) if arch == "rrdb" else Generator.srresnet(**kw)
    return SRModel(model_type="resnet", generator=gen,
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": 1e-4},
                   config=_train_cfg(tempfile.mkdtemp()))


def analyze(model, batch, crop, scale, steps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (batch, crop // scale, crop // scale, 3)),
                     jnp.float32)
    hr = jnp.asarray(rng.uniform(-1, 1, (batch, crop, crop, 3)), jnp.float32)
    step = model._build_train_step()
    compiled = step.lower(model.state, lr, hr).compile()
    mem = compiled.memory_analysis()
    row = {}
    if mem is not None:
        # field names vary across jaxlib versions; take what exists
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                row[k] = int(v)
    if steps:
        model.before_epoch()
        model.train_step(lr, hr)  # uses its own jit; warm
        jax.block_until_ready(model.state.g_params)
        t0 = time.perf_counter()
        for _ in range(steps):
            model.train_step(lr, hr)
        jax.block_until_ready(model.state.g_params)
        row["ms_per_step"] = round((time.perf_counter() - t0) / steps * 1e3, 2)
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--crop", type=int, default=128, help="HR crop size")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--steps", type=int, default=0,
                   help="also time N real steps per config")
    p.add_argument("--configs", default="srresnet:16,rrdb:16,rrdb:23",
                   help="comma list of arch:blocks")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke runs; env vars alone "
                        "lose to the TPU plugin)")
    args = p.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    results = []
    for spec in args.configs.split(","):
        arch, _, blocks = spec.partition(":")
        blocks = int(blocks or 16)
        for remat in (False, True):
            model = build_model(arch, remat, args.crop, args.scale, blocks)
            row = analyze(model, args.batch, args.crop, args.scale, args.steps)
            row.update(arch=arch, blocks=blocks, remat=remat)
            results.append(row)
            print(f"# {arch} b{blocks} remat={remat}: {row}", flush=True)
            del model

    temp = {(r["arch"], r["blocks"]): {} for r in results}
    for r in results:
        temp[(r["arch"], r["blocks"])][r["remat"]] = r
    print("\n| model | blocks | temp HBM (plain) | temp HBM (remat) | ratio |"
          " ms/step (plain→remat) |")
    print("|---|---|---|---|---|---|")
    for (arch, blocks), pair in temp.items():
        a, b = pair.get(False, {}), pair.get(True, {})
        ta, tb = a.get("temp_size_in_bytes"), b.get("temp_size_in_bytes")
        # `is not None`: a genuine 0-byte temp size must print as 0, not
        # masquerade as "field unavailable on this jaxlib"
        fmt = lambda v: f"{v / 2**20:.0f} MiB" if v is not None else "n/a"
        ratio = f"{ta / tb:.2f}×" if ta is not None and tb else "n/a"
        ms = (f"{a.get('ms_per_step', '—')} → {b.get('ms_per_step', '—')}"
              if args.steps else "—")
        print(f"| {arch} | {blocks} | {fmt(ta)} | {fmt(tb)} | {ratio} | {ms} |")
    print(json.dumps({"remat_study": results}))


if __name__ == "__main__":
    main()
