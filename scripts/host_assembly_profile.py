"""Host-assembly profile: where does a DataPipeline batch's time go?

VERDICT r4 #2: train_host_assembly_mpix_per_s regressed 164→122 across
r3→r4 coincident with the multi-worker/device-pool changes. This script
breaks one epoch of the bench corpus (div2k 0004 + 0006 + lena, 96² crops,
b16 — bench.py's measure_train_e2e_mpix_s setup) into measured stages:

  decode     PNG → uint8 ndarray (PIL), cold and cached
  crop       per-file crop-bank assembly (_host_crops)
  stack      chunk gather + np.stack (the _assemble hot loop)
  dispatch   jnp.asarray upload + jitted device prep call (async)
  generator  the full train_batch_generator loop as shipped, plus a
             worker-count sweep (num_workers = 1, 2, 4) and the
             device-resident pooled path if eligible

Run on the chip (or CPU for host-only stages):
    python scripts/host_assembly_profile.py [--crop 96] [--batch 16]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CORPUS = [
    "/root/reference/data/datasets/div2k/4/0004.png",
    "/root/reference/data/datasets/div2k/8/0006.png",
    "/root/reference/tests/data/lena.png",
]


def _staged_dir():
    tmp = tempfile.mkdtemp()
    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir)
    for i, src in enumerate(CORPUS):
        if os.path.exists(src):
            os.symlink(src, os.path.join(img_dir, f"{i}.png"))
    return img_dir


def _pipe(img_dir, crop, batch, num_workers=None, device_resident="auto"):
    from simplesr_tpu.data import DataPipeline

    return DataPipeline(
        hr_img_path=img_dir, scale=4, batch_size=batch,
        crop_size=(crop, crop, 3), num_crops=96, train_val_split=0.0,
        augmentations=["flip_along_x", "flip_along_y", "rotate90"],
        random_seed=0, drop_remainder=True, num_workers=num_workers,
        device_resident=device_resident)


def _consume(pipe, desc, results, crop, epochs=2):
    # warm epoch (decode cache, compiles), then measured epochs
    n = sum(int(b[0].shape[0]) for b in pipe.train_batch_generator())
    t0 = time.perf_counter()
    total = 0
    for _ in range(epochs):
        total = sum(int(b[0].shape[0]) for b in pipe.train_batch_generator())
    dt = time.perf_counter() - t0
    rate = epochs * total * crop * crop / 1e6 / dt
    results[desc] = round(rate, 2)
    print(f"[generator] {desc}: {rate:.1f} MPix/s "
          f"({total} imgs/epoch)", flush=True)
    return n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    crop, batch = args.crop, args.batch

    img_dir = _staged_dir()
    results = {"crop": crop, "batch": batch}

    # ---- stage micro-times (host only, single-thread, no device)
    pipe = _pipe(img_dir, crop, batch, device_resident=False)
    files = list(pipe.train_imgs)
    t0 = time.perf_counter()
    for f in files:
        pipe._decoded(f)  # fresh pipeline → cache cold
    results["decode_cold_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    for f in files:
        pipe._decoded(f)
    results["decode_cached_s"] = round(time.perf_counter() - t0, 4)

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    banks = {f: pipe._host_crops(f, np.random.default_rng(i))
             for i, f in enumerate(files)}
    n_crops = sum(len(b) for b in banks.values())
    dt = time.perf_counter() - t0
    results["crop_bank_s"] = round(dt, 3)
    results["crop_bank_mpix_s"] = round(
        n_crops * crop * crop / 1e6 / dt, 1)

    flat = [c for b in banks.values() for c in b]
    t0 = time.perf_counter()
    for start in range(0, len(flat) - batch, batch):
        np.stack(flat[start:start + batch])
    dt = time.perf_counter() - t0
    results["stack_mpix_s"] = round(
        (len(flat) // batch) * batch * crop * crop / 1e6 / dt, 1)
    print(f"[stages] decode cold {results['decode_cold_s']}s cached "
          f"{results['decode_cached_s']}s | crop bank "
          f"{results['crop_bank_mpix_s']} MPix/s | stack "
          f"{results['stack_mpix_s']} MPix/s", flush=True)

    # ---- shipped generator at each worker count (pool disabled: measures
    # the host path the e2e bench's ratio depends on)
    for w in (1, 2, 4):
        _consume(_pipe(img_dir, crop, batch, num_workers=w,
                       device_resident=False),
                 f"workers={w} (host path)", results, crop)

    # ---- device-resident pooled path (if eligible) and the auto default
    _consume(_pipe(img_dir, crop, batch, device_resident=True),
             "device-resident pool", results, crop)
    _consume(_pipe(img_dir, crop, batch), "auto (shipped default)",
             results, crop)

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "host_assembly")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "RESULTS.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("written:", os.path.join(out, "RESULTS.json"), flush=True)


if __name__ == "__main__":
    main()
