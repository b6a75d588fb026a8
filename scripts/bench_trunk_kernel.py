"""Measure the VMEM-resident Pallas trunk kernel against XLA's lowering of
the same residual trunk, on the real chip.

Methodology (see BASELINE.md / docs/performance.md): the axon tunnel makes
per-call timing meaningless, so N iterations are chained inside one jit via
`lax.fori_loop` (each consuming the previous output) and completion is
forced with a scalar fetch.

Run: python scripts/bench_trunk_kernel.py [batch] [hw] [chain]
Prints a JSON line per configuration.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from simplesr_tpu.models import SRResNet
from simplesr_tpu.models.srresnet import ResBlock
from simplesr_tpu.ops.pallas.trunk_kernel import srresnet_trunk_pallas, _pack_weights

NUM_BLOCKS = 16
C = 64


def main(batch=16, hw=128, chain=10):
    model = SRResNet(upsample_factor=4, num_res_blocks=NUM_BLOCKS,
                     num_filters=C, batch_norm=False)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))["params"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (batch, hw, hw, C)), jnp.float32)
    flops_per_iter = 2 * batch * hw * hw * 9 * C * C * 2 * NUM_BLOCKS

    block_params = [params[f"ResBlock_{i}"] for i in range(NUM_BLOCKS)]

    def trunk_xla(t):
        for p in block_params:
            t = ResBlock(C, batch_norm=False).apply({"params": p}, t, False)
        return t

    packed = _pack_weights(params, NUM_BLOCKS, C)

    def measure(fn, label, **extra):
        @jax.jit
        def chain_fn(t, n):
            def body(_, t):
                out = fn(t)
                return t * 0.5 + out * 1e-3  # consume output, keep bounded
            return jnp.sum(lax.fori_loop(0, n, body, t))

        t0 = time.perf_counter()
        float(chain_fn(x, 1))  # compile + warm
        compile_s = time.perf_counter() - t0
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain_fn(x, chain))
            dt = time.perf_counter() - t0
            best = max(best, flops_per_iter * chain / dt / 1e12)
        print(json.dumps({
            "kernel": label, "batch": batch, "hw": hw,
            "tflops_per_s": round(best, 2),
            "ms_per_fwd": round(flops_per_iter / (best * 1e12) * 1e3, 3),
            "compile_s": round(compile_s, 1), **extra}), flush=True)
        return best

    measure(trunk_xla, "xla_trunk")
    from functools import partial
    from simplesr_tpu.ops.pallas.trunk_kernel import _run
    for band in (8, 16, 32):
        if hw % band:
            continue
        try:
            measure(partial(_run, w=packed[0], b1=packed[1], b2=packed[2],
                            alpha=packed[3], num_blocks=NUM_BLOCKS, band=band,
                            interpret=False),
                    "pallas_vmem_trunk", band=band)
        except Exception as e:  # record the failure mode, keep sweeping
            print(json.dumps({"kernel": "pallas_vmem_trunk", "band": band,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
