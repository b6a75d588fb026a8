"""Benchmark: ×4 super-resolution megapixels/second on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...,
"extra_metrics": {...}}. The headline metric is SRResNet ×4 inference
output MPix/s; `extra_metrics` carries the rest of the driver-visible
story in the same line: fused-train-step throughput, END-TO-END training
throughput with the real DataPipeline feeding the step (host decode/crop →
uint8 upload → device prep → train step), and the lane-filled model
variants (SRResNet-128, wide RRDB).

Methodology note: the axon TPU tunnel makes `block_until_ready` unreliable
(dispatch is acknowledged before execution) and adds ~80 ms per host round
trip, so per-call wall timing is meaningless. Instead N forwards are chained
*inside one jit* via `lax.fori_loop` (each iteration consumes the previous
output, so nothing can be elided) and completion is forced by fetching the
scalar result; one dispatch latency amortizes over N iterations. Training
steps chain naturally (each consumes the previous optimizer state).
Calibration: the same harness measures 165 TFLOP/s on chained 8192³ bf16
matmuls — ~84 % of v5e peak — confirming the clock.

`vs_baseline` is the multiplier over the MEASURED floor: the reference's own
code (unmodified TF2, legacy Keras), benchmarked on this host by
scripts/measure_reference_floor.py — 0.154 MPix/s (CPU; the only hardware
the reference can use in this environment). The reference publishes no GPU
numbers (BASELINE.md); a generous ~5 MPix/s estimate for its CUDA-10.1-era
single GPU is reported as the clearly-secondary `vs_gpu_estimate` field.
North-star target (BASELINE.json): ≥5× that estimate, training AND
inference.
"""

import json
import os
import time

import numpy as np

REFERENCE_MPIX_S_CPU_MEASURED = 0.154        # scripts/measure_reference_floor.py
REFERENCE_TRAIN_MPIX_S_CPU_MEASURED = 0.014  # …measure_reference_floor.py --train
REFERENCE_MPIX_S_GPU_ESTIMATE = 5.0          # NOT a measurement — see docstring

# v5e bf16 matmul peak. The chained-matmul calibration in this harness
# measures 165 TFLOP/s (84 % of this), confirming the clock; MXU utilization
# below is effective_tflops / this peak so it is comparable across rounds.
PEAK_TFLOPS_BF16 = 197.0


def _xla_flops(jitted, *args):
    """FLOPs XLA reports for one call of `jitted` (None if unavailable).

    Uses the compiled executable's cost analysis — the same count the
    docs/performance.md roofline tables use — so `effective_tflops` is
    measured program FLOPs over measured wall time, not a hand model."""
    try:
        import jax
        if not hasattr(jitted, "lower"):
            jitted = jax.jit(jitted)
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None

BATCH = 16  # throughput saturates at ≥16 on v5e (52→81 MPix/s from 8→16)
LR_HW = 128
SCALE = 4
CHAIN = 25


def measure_inference_mpix_s(batch=BATCH, lr_hw=LR_HW, scale=SCALE, chain=CHAIN,
                             num_filters=64, polyphase=True, paired_ways=0,
                             with_flops=False):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from simplesr_tpu.models import SRResNet, paired_model, polyphase_model

    model = SRResNet(upsample_factor=scale, num_res_blocks=16,
                     num_filters=num_filters)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (batch, lr_hw, lr_hw, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), lr[:1])
    if paired_ways:
        # batch→channel paired trunk + polyphase tail (models/paired.py):
        # trunk convs run at ways·C channels with block-diagonal kernels —
        # w× the MACs but full MXU lanes (C=64→128 measured 53→155 TFLOP/s,
        # docs/performance.md). Exactness pinned by tests/models/test_paired.py.
        model, variables = paired_model(model, variables, ways=paired_ways,
                                        polyphase=polyphase)
    elif polyphase:
        # mathematically identical inference reparameterization (exactness
        # pinned by tests/models/test_polyphase.py); tail convs run at LR
        # with full MXU lanes instead of at 2x/4x with 64/3 channels
        model, variables = polyphase_model(model, variables)

    @jax.jit
    def fwd_chain(variables, x, n):
        def body(i, x):
            out = model.apply(variables, x, train=False)
            # feed a strided view back in: chains iterations on-device
            return x * 0.999 + 1e-6 * out[:, ::scale, ::scale, :]
        return jnp.sum(lax.fori_loop(0, n, body, x))

    float(fwd_chain(variables, lr, 1))  # compile + warm
    best = 0.0
    min_elapsed = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        float(fwd_chain(variables, lr, chain))  # fetch forces completion
        elapsed = time.perf_counter() - start
        min_elapsed = min(min_elapsed, elapsed)
        mpix = batch * (lr_hw * scale) ** 2 * chain / 1e6
        best = max(best, mpix / elapsed)
    if with_flops:
        # FLOPs of one forward (the chain's feedback mixing is negligible),
        # over the best chain wall time
        f = _xla_flops(lambda v, x: model.apply(v, x, train=False),
                       variables, lr)
        eff = f * chain / min_elapsed / 1e12 if f else None
        return best, eff
    return best


def measure_rrdb_inference_mpix_s(batch=BATCH, lr_hw=LR_HW, scale=SCALE,
                                  chain=10, mode="up", num_filters=64,
                                  num_rrdb_blocks=16, growth_channels=None,
                                  paired_ways=0):
    """RRDB/ESRGAN generator inference; mode: none|up|2phase|full
    (models/polyphase.py RRDBNetPolyphase variants). num_filters=128 is the
    lane-filled wide variant (dense convs at 64ch — docs/performance.md).
    paired_ways packs that many batch items into trunk channels
    (models/paired.py RRDBNetPaired — lane-fills the 32-wide dense convs
    with block-diagonal kernels; production tail, mode ignored)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from simplesr_tpu.models import RRDBNet
    from simplesr_tpu.models.paired import rrdb_paired_model
    from simplesr_tpu.models.polyphase import rrdb_polyphase_model

    model = RRDBNet(upsample_factor=scale, num_filters=num_filters,
                    num_rrdb_blocks=num_rrdb_blocks,
                    growth_channels=growth_channels)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (batch, lr_hw, lr_hw, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), lr[:1])
    if paired_ways:
        model, variables = rrdb_paired_model(model, variables,
                                             ways=paired_ways)
    elif mode != "none":
        model, variables = rrdb_polyphase_model(model, variables, mode=mode)

    @jax.jit
    def fwd_chain(variables, x, n):
        def body(i, x):
            out = model.apply(variables, x, train=False)
            return x * 0.999 + 1e-6 * out[:, ::scale, ::scale, :]
        return jnp.sum(lax.fori_loop(0, n, body, x))

    float(fwd_chain(variables, lr, 1))
    best = 0.0
    for _ in range(3):
        start = time.perf_counter()
        float(fwd_chain(variables, lr, chain))
        elapsed = time.perf_counter() - start
        mpix = batch * (lr_hw * scale) ** 2 * chain / 1e6
        best = max(best, mpix / elapsed)
    return best


def _train_cfg(tmp):
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


def _srresnet_train_model(tmp, crop=96, scale=SCALE, batch_norm=True,
                          paired_ways=None):
    from simplesr_tpu.train import Generator, SRModel

    gen = Generator.srresnet(upsample_factor=scale, batch_norm=batch_norm,
                             input_dims=(crop // scale, crop // scale))
    return SRModel(model_type="resnet", generator=gen,
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": 1e-4},
                   config=_train_cfg(tmp), paired_ways=paired_ways)


def _rrdb_train_model(tmp, crop=96, scale=SCALE):
    from simplesr_tpu.train import Generator, SRModel

    gen = Generator.rrdb(upsample_factor=scale,
                         input_dims=(crop // scale, crop // scale))
    return SRModel(model_type="resnet", generator=gen,
                   generator_optimizer="Adam",
                   generator_optimizer_config={"learning_rate": 1e-4},
                   config=_train_cfg(tmp))


def measure_train_ms_per_step(steps=30, crop=96, scale=SCALE,
                              with_flops=False, batch=16, batch_norm=True,
                              paired_ways=None, arch="srresnet"):
    """Fused train step, batch × crop² HR crops.

    Defaults = the paper recipe (BN SRResNet, b16×96²) for cross-round
    comparability. batch_norm=False + paired_ways=2 is the PRODUCTION
    pretrain recipe (what the quality campaigns actually train is BN-free;
    pairing is the exact packed-layout rewrite, train/paired.py).
    arch="rrdb" measures the reference-topology RRDB generator instead
    (the expensive architecture users train — reference README.md:97-106).
    Steps chain through the optimizer state, so N steps time as one queue."""
    import tempfile
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if arch == "rrdb":
        model = _rrdb_train_model(tempfile.mkdtemp(), crop, scale)
    else:
        model = _srresnet_train_model(tempfile.mkdtemp(), crop, scale,
                                      batch_norm=batch_norm,
                                      paired_ways=paired_ways)
    lr = jnp.asarray(rng.uniform(0, 1, (batch, crop // scale, crop // scale, 3)),
                     jnp.float32)
    hr = jnp.asarray(rng.uniform(-1, 1, (batch, crop, crop, 3)), jnp.float32)
    model.before_epoch()
    model.train_step(lr, hr)

    def fence():
        import jax as _jax
        import jax.numpy as _jnp
        return float(_jnp.sum(_jax.tree_util.tree_leaves(
            model.state.g_params)[0].astype(_jnp.float32)))

    fence()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            model.train_step(lr, hr)
            model.after_train_batch()
        fence()
        best = min(best, (time.perf_counter() - t0) / steps)
    ms = best * 1000.0
    if with_flops:
        # the exact fused fwd+bwd+optimizer program XLA compiled
        f = _xla_flops(model._train_step_fn, model.state, lr, hr)
        eff = f / best / 1e12 if f else None
        return ms, eff
    return ms


def measure_train_e2e_mpix_s(epochs=3, crop=96, scale=SCALE,
                             batch_norm=True, paired_ways=None, batch=16):
    """END-TO-END training throughput: the real DataPipeline (host decode →
    C++ crop server → uint8 upload → jitted device prep) feeding the fused
    train step, exactly the reference's hot loop
    (/root/reference/simple_sr/operations/training.py:46-49). Returns
    (e2e HR MPix/s, device-only HR MPix/s, host assembly-only MPix/s).

    First epoch warms the decode cache and compiles; later epochs measured.

    Methodology note: the measured window is `epochs` full epochs with ONE
    value-fetch fence at the end — the same amortization
    measure_train_ms_per_step uses. A per-epoch fence would charge the dev
    tunnel's ~80 ms host round trip against every epoch, which at small
    epoch sizes measures the tunnel, not the pipeline (a fence per 18-step
    epoch understated the sustained rate ~3×; on directly attached TPU the
    fence is sub-ms and either methodology agrees).
    """
    import tempfile
    import jax
    from simplesr_tpu.data import DataPipeline

    corpus = [
        "/root/reference/data/datasets/div2k/4/0004.png",
        "/root/reference/data/datasets/div2k/8/0006.png",
        "/root/reference/tests/data/lena.png",
    ]
    tmp = tempfile.mkdtemp()
    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir)
    for i, src in enumerate(corpus):
        if os.path.exists(src):
            os.symlink(src, os.path.join(img_dir, f"{i}.png"))

    pipe = DataPipeline(
        hr_img_path=img_dir, scale=scale, batch_size=batch,
        crop_size=(crop, crop, 3), num_crops=96, train_val_split=0.0,
        augmentations=["flip_along_x", "flip_along_y", "rotate90"],
        random_seed=0, drop_remainder=True)
    model = _srresnet_train_model(tmp, crop, scale, batch_norm=batch_norm,
                                  paired_ways=paired_ways)

    def one_epoch():
        model.before_epoch()
        n = 0
        for lr_b, hr_b in pipe.train_batch_generator():
            model.train_step(lr_b, hr_b)
            model.after_train_batch()
            n += int(lr_b.shape[0])
        return n

    def fence():
        # value fetch: the only real execution barrier through the tunnel
        jax.block_until_ready(model.state.g_params)
        float(np.asarray(jax.tree_util.tree_leaves(
            model.state.g_params)[0]).ravel()[0])

    one_epoch()  # warm: decode cache, jit compiles
    fence()
    t0 = time.perf_counter()
    n_imgs = sum(one_epoch() for _ in range(epochs))
    fence()
    dt = time.perf_counter() - t0
    best = n_imgs * crop * crop / 1e6 / dt

    # device-only floor for the ratio: same step, host-resident batch
    ms = measure_train_ms_per_step(steps=20, crop=crop, scale=scale,
                                   batch_norm=batch_norm, batch=batch,
                                   paired_ways=paired_ways)
    device_mpix = batch * crop * crop / 1e6 / (ms / 1000.0)

    # host-assembly-only rate (no device work): how fast the pipeline can
    # produce batches if the device were infinitely fast
    t0 = time.perf_counter()
    n = sum(int(lr_b.shape[0]) for lr_b, _ in pipe.train_batch_generator())
    host_mpix = n * crop * crop / 1e6 / (time.perf_counter() - t0)
    return best, device_mpix, host_mpix


def measure_serving_mpix_s(model_path=None, scale=4, hw=128, n_per_client=8,
                           clients=8, paired=0):
    """END-TO-END serving throughput: PNG bytes → serve daemon (subprocess,
    holds the chip) → batched SR → PNG bytes back, over `clients` concurrent
    persistent connections (the daemon batches same-shape requests up to
    max_batch). Includes client+server PNG codec work — the real wire cost.
    MUST run standalone: the parent must not touch the TPU first (one
    process per chip)."""
    import io
    import subprocess
    import sys
    import tempfile
    import threading
    from PIL import Image
    from simplesr_tpu.tools.serve import SRClient

    if model_path is None:
        model_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "results",
            "quality_r4", "models", "resnet_gen_srresnet_x4_best.msgpack")
    sock = os.path.join(tempfile.mkdtemp(), "sr.sock")
    cmd = [sys.executable, "-m", "simplesr_tpu.tools.serve",
           "--model", model_path, "--scale", str(scale), "--socket", sock,
           "--max-batch", str(clients)]
    if paired:
        cmd += ["--paired", str(paired)]
    proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        t0 = time.time()
        while not os.path.exists(sock):
            if proc.poll() is not None:
                raise RuntimeError("serve daemon exited before binding")
            if time.time() - t0 > 900:
                raise TimeoutError("serve daemon did not bind its socket")
            time.sleep(0.5)
        rng = np.random.default_rng(0)
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 256, (hw, hw, 3)).astype(np.uint8)
                        ).save(buf, format="PNG")
        png = buf.getvalue()

        def run_client(n, out):
            with SRClient(sock) as c:
                for _ in range(n):
                    out.append(c.upscale_bytes(png).shape)

        run_client(2, [])  # warm: compiles the shape bucket
        outs = [[] for _ in range(clients)]
        threads = [threading.Thread(target=run_client,
                                    args=(n_per_client, outs[i]))
                   for i in range(clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        n = sum(len(o) for o in outs)
        if n != clients * n_per_client:
            raise RuntimeError(f"only {n} of {clients * n_per_client} "
                               "requests completed")
        return n * (hw * scale) ** 2 / 1e6 / dt
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def collect_default():
    """The driver's one-line record: headline inference + extras."""
    mpix, inf_tflops = measure_inference_mpix_s(with_flops=True)
    extras = {}
    if inf_tflops:
        extras["inference_effective_tflops"] = round(inf_tflops, 1)
        extras["inference_mxu_util"] = round(inf_tflops / PEAK_TFLOPS_BF16, 3)
    try:
        # paper recipe (BN, unpaired): kept for cross-round comparability
        ms, train_tflops = measure_train_ms_per_step(with_flops=True)
        extras["srresnet_x4_train_paper_bn_ms_per_step_b16"] = round(ms, 2)
        extras["srresnet_x4_train_paper_bn_mpix_per_s"] = round(
            16 * 96 * 96 / 1e6 / (ms / 1000.0), 2)
        if train_tflops:
            extras["train_paper_bn_effective_tflops"] = round(train_tflops, 1)
    except Exception as e:
        extras["train_step_error"] = f"{type(e).__name__}: {e}"
    try:
        # PRODUCTION pretrain recipe (VERDICT r4 #1): BN-free (EDSR finding;
        # every zoo model trains BN-free) at EDSR-scale b64×192² crops,
        # plus the exact paired-trunk packed layout (train/paired.py).
        # Recipe chosen by the measured sweep (docs/performance.md): at the
        # paper's b16×96² the step is launch-bound and pairing LOSES
        # (0.89×); at b64×192² pairing wins 1.15× and the recipe clears
        # 40 MPix/s. Quality parity: results/quality_fastrecipe/ trains
        # this exact recipe to campaign-equivalent held-out quality.
        PB, PC = 64, 192
        ms_free, free_tflops = measure_train_ms_per_step(
            with_flops=True, batch_norm=False, batch=PB, crop=PC, steps=15)
        extras["srresnet_x4_train_bnfree_ms_per_step_b64_crop192"] = \
            round(ms_free, 2)
        ms_pair = measure_train_ms_per_step(batch_norm=False, paired_ways=2,
                                            batch=PB, crop=PC, steps=15)
        extras["srresnet_x4_train_ms_per_step_b64_crop192_paired2"] = \
            round(ms_pair, 2)
        train_mpix = PB * PC * PC / 1e6 / (ms_pair / 1000.0)
        extras["srresnet_x4_train_device_mpix_per_s"] = round(train_mpix, 2)
        extras["train_recipe"] = "bnfree_paired2_b64_crop192"
        extras["train_vs_reference_cpu_floor"] = round(
            train_mpix / REFERENCE_TRAIN_MPIX_S_CPU_MEASURED, 1)
        if free_tflops:
            # USEFUL work rate: the unpaired program's FLOP count over the
            # paired wall time (the paired program's own count includes the
            # structural-zero MACs — occupancy, not useful throughput)
            useful = free_tflops * ms_free / ms_pair
            extras["train_effective_tflops"] = round(useful, 1)
            extras["train_mxu_util"] = round(useful / PEAK_TFLOPS_BF16, 3)
    except Exception as e:
        extras["train_production_error"] = f"{type(e).__name__}: {e}"
    try:
        # RRDB train step (VERDICT r4 #8): the expensive architecture users
        # actually train (reference README.md:97-106 documents its cost and
        # instability); reference-topology 16-block nf=64, BN-free by design
        ms_rrdb = measure_train_ms_per_step(arch="rrdb", steps=15)
        extras["rrdb_x4_train_ms_per_step_b16"] = round(ms_rrdb, 2)
        extras["rrdb_x4_train_device_mpix_per_s"] = round(
            16 * 96 * 96 / 1e6 / (ms_rrdb / 1000.0), 2)
    except Exception as e:
        extras["rrdb_train_error"] = f"{type(e).__name__}: {e}"
    try:
        # e2e rides the production recipe so the ratio compares like to like
        e2e, device, host = measure_train_e2e_mpix_s(batch_norm=False,
                                                     paired_ways=2,
                                                     batch=64, crop=192)
        extras["srresnet_x4_train_e2e_mpix_per_s"] = round(e2e, 2)
        extras["train_e2e_over_device_ratio"] = round(e2e / device, 3)
        extras["train_host_assembly_mpix_per_s"] = round(host, 2)
    except Exception as e:
        extras["train_e2e_error"] = f"{type(e).__name__}: {e}"
    try:
        extras["srresnet128_x4_inference_mpix_per_s"] = round(
            measure_inference_mpix_s(num_filters=128, chain=10), 2)
    except Exception as e:
        extras["srresnet128_error"] = f"{type(e).__name__}: {e}"
    try:
        extras["rrdb_x4_inference_mpix_per_s"] = round(
            measure_rrdb_inference_mpix_s(mode="up"), 2)
        # wide RRDB: nf=128 trunk, growth=128 dense convs (full MXU lane
        # fill — the conv OUTPUT channel count is the lane dimension),
        # 2 blocks. Slightly MORE FLOPs than the 16-block nf=64 baseline
        # (13.3M vs 11.5M MACs/LR px) yet 2.85× the throughput; the measured
        # winner of the growth/blocks sweep, in its PRODUCTION tail form —
        # the "up" polyphase mode measured 20% slower for this config
        # (docs/performance.md).
        extras["rrdb_wide128g128_b2_x4_inference_mpix_per_s"] = round(
            measure_rrdb_inference_mpix_s(mode="none", num_filters=128,
                                          num_rrdb_blocks=2,
                                          growth_channels=128), 2)
    except Exception as e:
        extras["rrdb_error"] = f"{type(e).__name__}: {e}"
    headline = mpix
    headline_config = "polyphase_b16"
    try:
        # batch→channel paired trunk (models/paired.py): exact block-diag
        # lane-fill rewrite; measured against the plain polyphase lowering
        # at the same total batch (32 — pairing halves the conv batch, and
        # C=128 needs batch ≥16 for its 155 TFLOP/s peak)
        base32 = measure_inference_mpix_s(batch=32, chain=15)
        p32 = measure_inference_mpix_s(batch=32, chain=15, paired_ways=2)
        extras["srresnet_x4_b32_inference_mpix_per_s"] = round(base32, 2)
        extras["srresnet_x4_paired2_b32_inference_mpix_per_s"] = round(p32, 2)
        extras["paired2_over_unpaired_b32"] = round(p32 / base32, 3)
        # headline = best PRODUCTION-LEGAL serving config of the parity
        # model: paired is an exact weight-space rewrite exposed on the
        # serving surface (--paired on upscale/serve/http_gateway), so the
        # per-chip throughput a user actually gets is the max of the two
        if p32 > headline:
            headline = p32
            headline_config = "polyphase_paired2_b32"
    except Exception as e:
        extras["paired_error"] = f"{type(e).__name__}: {e}"
    try:
        # same lever on the reference-topology RRDB (dense convs at 32
        # output lanes): 4-way pairing fills the 128 lanes outright
        rb = measure_rrdb_inference_mpix_s(batch=32, chain=6, mode="none")
        rp = measure_rrdb_inference_mpix_s(batch=32, chain=6, paired_ways=4)
        extras["rrdb_x4_b32_inference_mpix_per_s"] = round(rb, 2)
        extras["rrdb_x4_paired4_b32_inference_mpix_per_s"] = round(rp, 2)
        extras["rrdb_paired4_over_unpaired_b32"] = round(rp / rb, 3)
    except Exception as e:
        extras["rrdb_paired_error"] = f"{type(e).__name__}: {e}"
    extras["headline_config"] = headline_config
    extras["srresnet_x4_polyphase_b16_inference_mpix_per_s"] = round(mpix, 2)
    return {
        "metric": "srresnet_x4_inference_output_mpix_per_s",
        "value": round(headline, 2),
        "unit": "MPix/s/chip",
        # the honest multiplier: vs the reference's own code MEASURED on the
        # only hardware it can use here (scripts/measure_reference_floor.py)
        "vs_baseline": round(headline / REFERENCE_MPIX_S_CPU_MEASURED, 1),
        "baseline_note": {
            "baseline_is": "measured reference floor (its own TF2 code, "
                           "this host CPU)",
            "reference_cpu_measured_floor_mpix_s": REFERENCE_MPIX_S_CPU_MEASURED,
            "reference_gpu_mpix_s_ESTIMATE": REFERENCE_MPIX_S_GPU_ESTIMATE,
            "vs_gpu_estimate": round(headline / REFERENCE_MPIX_S_GPU_ESTIMATE,
                                     2),
        },
        "extra_metrics": extras,
    }


def _flag_int(argv, flag, default):
    """Optional integer following `flag` (absent or non-numeric → default)."""
    if flag not in argv:
        return default
    i = argv.index(flag) + 1
    return int(argv[i]) if i < len(argv) and argv[i].isdigit() else default


def _guard_device_liveness(probe_s=900, hard_cap_s=3600):
    """The dev tunnel can die such that every device op blocks FOREVER (no
    error). A hung bench records nothing; an explicit failure line is
    strictly more useful. Probe the device in a daemon thread — if the
    probe doesn't complete in `probe_s`, print an honest error JSON line
    and exit. A second timer hard-caps the whole run.

    probe_s=900 because a *healthy but cold* tunnel has been measured taking
    ~390 s for its first device op (backend init + first program; everything
    after runs at normal speed) — a 300 s probe misreported that as a dead
    tunnel (r3). 900 s separates "slow init" from "actually hung"."""
    import threading

    def bail(reason):
        print(json.dumps({
            "metric": "srresnet_x4_inference_output_mpix_per_s",
            "value": None, "unit": "MPix/s/chip", "vs_baseline": None,
            "error": reason}), flush=True)
        os._exit(3)

    done = threading.Event()

    def probe():
        import jax
        import jax.numpy as jnp
        (jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
        float(jnp.zeros(()))  # value fetch: the only real barrier
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(probe_s):
        bail(f"device unreachable: warm-up matmul did not complete in "
             f"{probe_s}s (dead tunnel?)")
    cap = threading.Timer(hard_cap_s, bail,
                          args=(f"bench exceeded {hard_cap_s}s hard cap",))
    cap.daemon = True  # must not keep a finished bench process alive
    cap.start()


def main(argv=None):
    import sys
    argv = sys.argv[1:] if argv is None else argv
    # Persistent XLA executable cache: the driver runs this at round end on
    # a possibly cold tunnel where big compiles cost minutes; cached
    # executables from any earlier run (same machine) cut that to seconds.
    # SIMPLESR_COMPILE_CACHE overrides the location; utils/compile_cache.py.
    try:
        from simplesr_tpu.utils import enable_compile_cache
        enable_compile_cache(os.environ.get(
            "SIMPLESR_COMPILE_CACHE",
            os.path.expanduser("~/.cache/simplesr_xla")))
    except Exception as exc:  # cache is an optimization, never a bench failure
        print(f"warning: compile cache disabled ({type(exc).__name__}: {exc})",
              file=sys.stderr)
    if "--serve" in argv:
        # BEFORE the liveness guard: the parent must stay off the chip so
        # the serve daemon subprocess can hold it
        paired = _flag_int(argv, "--paired", 0)
        mpix = measure_serving_mpix_s(paired=paired)
        print(json.dumps({
            "metric": "srresnet_x4_serving_e2e_mpix_per_s"
                      + (f"_paired{paired}" if paired else ""),
            "value": round(mpix, 2),
            "unit": "MPix/s/chip",
            "vs_baseline": None,
            "note": "PNG-in/PNG-out over 8 concurrent persistent "
                    "connections incl. codec work (tools/serve.py daemon)",
        }))
        return
    if "--no-guard" not in argv:
        _guard_device_liveness()
    if "--train-production" in argv:
        # the production pretrain recipe in isolation: BN-free + paired2
        # (optionally --ways w / --batch b / --crop c)
        ways = _flag_int(argv, "--ways", 2)
        batch = _flag_int(argv, "--batch", 16)
        crop = _flag_int(argv, "--crop", 96)
        ms_free = measure_train_ms_per_step(batch=batch, crop=crop,
                                            batch_norm=False)
        ms = measure_train_ms_per_step(batch=batch, crop=crop,
                                       batch_norm=False,
                                       paired_ways=ways if ways >= 2 else None)
        print(json.dumps({
            "metric": f"srresnet_x4_train_bnfree_paired{ways}"
                      f"_b{batch}_crop{crop}_ms_per_step",
            "value": round(ms, 2),
            "unit": "ms/step",
            "vs_baseline": None,
            "note": {"bnfree_unpaired_ms": round(ms_free, 2),
                     "paired_over_unpaired_speedup": round(ms_free / ms, 3),
                     "device_mpix_per_s": round(
                         batch * crop * crop / 1e6 / (ms / 1000.0), 2)},
        }))
        return
    if "--train-rrdb" in argv:
        batch = _flag_int(argv, "--batch", 16)
        crop = _flag_int(argv, "--crop", 96)
        ms = measure_train_ms_per_step(arch="rrdb", steps=15, batch=batch,
                                       crop=crop)
        print(json.dumps({
            "metric": f"rrdb_x4_train_b{batch}_crop{crop}_ms_per_step",
            "value": round(ms, 2),
            "unit": "ms/step",
            "vs_baseline": None,
            "note": {"device_mpix_per_s": round(
                batch * crop * crop / 1e6 / (ms / 1000.0), 2)},
        }))
        return
    if "--train" in argv:
        ms = measure_train_ms_per_step()
        print(json.dumps({
            "metric": "srresnet_x4_train_ms_per_step_b16",
            "value": round(ms, 2),
            "unit": "ms/step",
            "vs_baseline": None,
        }))
        return
    if "--train-e2e" in argv:
        e2e, device, host = measure_train_e2e_mpix_s()
        print(json.dumps({
            "metric": "srresnet_x4_train_e2e_mpix_per_s_b16",
            "value": round(e2e, 2),
            "unit": "MPix/s/chip",
            "vs_baseline": None,
            "note": {"device_only_mpix_per_s": round(device, 2),
                     "host_assembly_mpix_per_s": round(host, 2),
                     "e2e_over_device_ratio": round(e2e / device, 3)},
        }))
        return
    if "--rrdb-paired" in argv:
        # paired trunk on the reference-topology RRDB: dense convs go from
        # 32 to ways*32 output lanes (block-diag, exact). Compared against
        # the production lowering at the same total batch.
        ways = _flag_int(argv, "--rrdb-paired", 2)
        if ways < 2:
            raise SystemExit(f"--rrdb-paired ways must be >= 2, got {ways}")
        batch = _flag_int(argv, "--batch", 32)
        mpix = measure_rrdb_inference_mpix_s(batch=batch, chain=6,
                                             paired_ways=ways)
        base = measure_rrdb_inference_mpix_s(batch=batch, chain=6,
                                             mode="none")
        print(json.dumps({
            "metric": f"rrdb_x4_paired{ways}_b{batch}"
                      "_inference_output_mpix_per_s",
            "value": round(mpix, 2),
            "unit": "MPix/s/chip",
            "vs_baseline": None,
            "note": {"unpaired_same_batch_mpix_per_s": round(base, 2),
                     "paired_over_unpaired": round(mpix / base, 3)},
        }))
        return
    if "--rrdb" in argv:
        mode = argv[argv.index("--rrdb") + 1] if \
            len(argv) > argv.index("--rrdb") + 1 else "up"
        if mode not in ("none", "up", "2phase", "full"):
            raise SystemExit(f"--rrdb mode must be none|up|2phase|full, "
                             f"got {mode!r}")
        nf = 64
        blocks = 16
        if "--filters" in argv:
            nf = int(argv[argv.index("--filters") + 1])
        if "--blocks" in argv:
            blocks = int(argv[argv.index("--blocks") + 1])
        mpix = measure_rrdb_inference_mpix_s(mode=mode, num_filters=nf,
                                             num_rrdb_blocks=blocks)
        print(json.dumps({
            "metric": f"rrdb_x4_f{nf}_b{blocks}_inference_output_mpix"
                      f"_per_s_{mode}",
            "value": round(mpix, 2),
            "unit": "MPix/s/chip",
            "vs_baseline": None,
        }))
        return
    if "--paired" in argv:
        # batch→channel paired trunk (models/paired.py): measure the block-
        # diagonal lane-fill rewrite vs the plain polyphase lowering at the
        # same total batch. The lever needs batch ≥ 2·saturation (pairing
        # halves the effective batch the conv sees), so default batch 32.
        ways = _flag_int(argv, "--paired", 2)
        if ways < 2:
            raise SystemExit(f"--paired ways must be >= 2, got {ways}")
        batch = _flag_int(argv, "--batch", 32)
        polyphase = "--no-poly" not in argv
        mpix = measure_inference_mpix_s(batch=batch, paired_ways=ways,
                                        polyphase=polyphase, chain=15)
        base = measure_inference_mpix_s(batch=batch, polyphase=polyphase,
                                        chain=15)
        print(json.dumps({
            "metric": f"srresnet_x4_paired{ways}_b{batch}"
                      "_inference_output_mpix_per_s",
            "value": round(mpix, 2),
            "unit": "MPix/s/chip",
            "vs_baseline": None,
            "note": {"unpaired_same_batch_mpix_per_s": round(base, 2),
                     "paired_over_unpaired": round(mpix / base, 3)},
        }))
        return
    if "--filters" in argv:
        # docs/performance.md roofline: C=64 half-fills the 128-lane MXU;
        # --filters 128 measures the lane-filling model variant
        num_filters = int(argv[argv.index("--filters") + 1])
        polyphase = "--no-poly" not in argv
        mpix = measure_inference_mpix_s(num_filters=num_filters,
                                        polyphase=polyphase)
        tail = "poly" if polyphase else "trainform"
        print(json.dumps({
            "metric": f"srresnet_x4_f{num_filters}_{tail}"
                      "_inference_output_mpix_per_s",
            "value": round(mpix, 2),
            "unit": "MPix/s/chip",
            "vs_baseline": None,
            "note": "model-variant measurement (not the parity architecture)",
        }))
        return
    if "--inference-only" in argv:
        mpix = measure_inference_mpix_s(
            polyphase="--no-poly" not in argv)
        print(json.dumps({
            "metric": "srresnet_x4_inference_output_mpix_per_s",
            "value": round(mpix, 2),
            "unit": "MPix/s/chip",
            "vs_baseline": round(mpix / REFERENCE_MPIX_S_CPU_MEASURED, 1),
        }))
        return
    print(json.dumps(collect_default()))


if __name__ == "__main__":
    main()
