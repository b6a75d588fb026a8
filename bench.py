"""Benchmark: ×4 super-resolution megapixels/second on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: output megapixels per second for SRResNet ×4 inference (bf16 compute,
batch 16 × 128×128 LR → 512×512 SR), steady state.

Methodology note: the axon TPU tunnel makes `block_until_ready` unreliable
(dispatch is acknowledged before execution) and adds ~80 ms per host round
trip, so per-call wall timing is meaningless. Instead N forwards are chained
*inside one jit* via `lax.fori_loop` (each iteration consumes the previous
output, so nothing can be elided) and completion is forced by fetching the
scalar result; one dispatch latency amortizes over N iterations. Calibration:
the same harness measures 165 TFLOP/s on chained 8192³ bf16 matmuls — ~84 %
of v5e peak — confirming the clock.

`vs_baseline` compares against REFERENCE_MPIX_S_GPU_ESTIMATE — an ESTIMATE of
the TF2 reference's throughput on its CUDA-10.1-era single GPU (the reference
publishes no numbers, BASELINE.md; ~5 MPix/s is generous for fp32 SRResNet ×4
on a 2080-class card). The JSON labels it as an estimate and also reports the
honest MEASURED floor: the reference's own code (unmodified, legacy-Keras)
benchmarked on this host's CPU by scripts/measure_reference_floor.py —
0.154 MPix/s. North-star target is ≥5× the estimate (BASELINE.json).
"""

import json
import time

import numpy as np

REFERENCE_MPIX_S_GPU_ESTIMATE = 5.0    # NOT a measurement — see docstring
REFERENCE_MPIX_S_CPU_MEASURED = 0.154  # scripts/measure_reference_floor.py

BATCH = 16  # throughput saturates at ≥16 on v5e (52→81 MPix/s from 8→16)
LR_HW = 128
SCALE = 4
CHAIN = 25


def measure_inference_mpix_s(batch=BATCH, lr_hw=LR_HW, scale=SCALE, chain=CHAIN,
                             num_filters=64, polyphase=True):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from simplesr_tpu.models import SRResNet, polyphase_model

    model = SRResNet(upsample_factor=scale, num_res_blocks=16,
                     num_filters=num_filters)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (batch, lr_hw, lr_hw, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), lr[:1])
    if polyphase:
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
    for _ in range(3):
        start = time.perf_counter()
        float(fwd_chain(variables, lr, chain))  # fetch forces completion
        elapsed = time.perf_counter() - start
        mpix = batch * (lr_hw * scale) ** 2 * chain / 1e6
        best = max(best, mpix / elapsed)
    return best


def measure_rrdb_inference_mpix_s(batch=BATCH, lr_hw=LR_HW, scale=SCALE,
                                  chain=10, mode="up"):
    """RRDB/ESRGAN generator inference; mode: none|up|2phase|full
    (models/polyphase.py RRDBNetPolyphase variants)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from simplesr_tpu.models import RRDBNet
    from simplesr_tpu.models.polyphase import rrdb_polyphase_model

    model = RRDBNet(upsample_factor=scale)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (batch, lr_hw, lr_hw, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), lr[:1])
    if mode != "none":
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


def measure_train_ms_per_step(steps=30):
    """SRResNet ×4 fused train step, batch 16 × 96² crops (paper config)."""
    import tempfile
    import jax
    import jax.numpy as jnp
    from simplesr_tpu.train import Generator, SRModel

    tmp = tempfile.mkdtemp()

    class Cfg:
        model_dir = tmp + "/m"
        checkpoint_dir = tmp + "/c"
        early_stop_metric = "psnr"
        early_stop_patience = 10**6
        epoch_train_summary_writer = None
        batch_train_summary_writer = None
        epoch_validation_summary_writer = None
        batch_validation_summary_writer = None

    rng = np.random.default_rng(0)
    gen = Generator.srresnet(upsample_factor=4, input_dims=(24, 24))
    model = SRModel(model_type="resnet", generator=gen,
                    generator_optimizer="Adam",
                    generator_optimizer_config={"learning_rate": 1e-4},
                    config=Cfg)
    lr = jnp.asarray(rng.uniform(0, 1, (16, 24, 24, 3)), jnp.float32)
    hr = jnp.asarray(rng.uniform(-1, 1, (16, 96, 96, 3)), jnp.float32)
    model.before_epoch()
    model.train_step(lr, hr)

    def fence():
        import jax as _jax
        return float(jnp.sum(_jax.tree_util.tree_leaves(
            model.state.g_params)[0].astype(jnp.float32)))

    fence()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(steps):
            model.train_step(lr, hr)
            model.after_train_batch()
        fence()
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1000.0


def main(argv=None):
    import sys
    argv = sys.argv[1:] if argv is None else argv
    if "--train" in argv:
        ms = measure_train_ms_per_step()
        print(json.dumps({
            "metric": "srresnet_x4_train_ms_per_step_b16",
            "value": round(ms, 2),
            "unit": "ms/step",
            "vs_baseline": None,
        }))
        return
    if "--rrdb" in argv:
        mode = argv[argv.index("--rrdb") + 1] if \
            len(argv) > argv.index("--rrdb") + 1 else "up"
        if mode not in ("none", "up", "2phase", "full"):
            raise SystemExit(f"--rrdb mode must be none|up|2phase|full, "
                             f"got {mode!r}")
        mpix = measure_rrdb_inference_mpix_s(mode=mode)
        print(json.dumps({
            "metric": f"rrdb_x4_inference_output_mpix_per_s_{mode}",
            "value": round(mpix, 2),
            "unit": "MPix/s/chip",
            "vs_baseline": None,
        }))
        return
    num_filters = 64
    if "--filters" in argv:
        # docs/performance.md roofline: C=64 half-fills the 128-lane MXU;
        # --filters 128 measures the lane-filling model variant
        num_filters = int(argv[argv.index("--filters") + 1])
    polyphase = "--no-poly" not in argv
    mpix_per_s = measure_inference_mpix_s(num_filters=num_filters,
                                          polyphase=polyphase)
    if num_filters != 64:
        tail = "poly" if polyphase else "trainform"
        print(json.dumps({
            "metric": f"srresnet_x4_f{num_filters}_{tail}"
                      "_inference_output_mpix_per_s",
            "value": round(mpix_per_s, 2),
            "unit": "MPix/s/chip",
            "vs_baseline": None,
            "note": "model-variant measurement (not the parity architecture)",
        }))
        return
    print(json.dumps({
        "metric": "srresnet_x4_inference_output_mpix_per_s",
        "value": round(mpix_per_s, 2),
        "unit": "MPix/s/chip",
        "vs_baseline": round(mpix_per_s / REFERENCE_MPIX_S_GPU_ESTIMATE, 2),
        "baseline_note": {
            "reference_gpu_mpix_s": REFERENCE_MPIX_S_GPU_ESTIMATE,
            "reference_gpu_is_estimate": True,  # ref publishes no numbers
            "reference_cpu_measured_floor_mpix_s": REFERENCE_MPIX_S_CPU_MEASURED,
            "vs_measured_cpu_floor": round(
                mpix_per_s / REFERENCE_MPIX_S_CPU_MEASURED, 1),
        },
    }))


if __name__ == "__main__":
    main()
