"""Shared hoist-proof chained-timing harness for the bench scripts.

Through the axon tunnel `block_until_ready` returns before execution and
every host round trip costs ~80 ms, so per-call wall timing lies. Worse, a
loop whose body doesn't depend on the carry gets hoisted by XLA (LICM): an
earlier carry-only harness measured 215 TFLOP/s — above chip peak. This
helper chains N iterations inside ONE jit with each iteration's input
derived from the previous output (bench.py methodology), and fences with a
scalar fetch.
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def chained_measure(fn, x, label, chain, flops=None):
    """Print and return the best per-iteration seconds for `fn(x)`."""
    probe = fn(x)
    sy = probe.shape[1] // x.shape[1]
    sx = probe.shape[2] // x.shape[2]
    reps = -(-x.shape[3] // probe.shape[3])  # ceil

    @jax.jit
    def chain_fn(t, n):
        def body(_, t):
            out = fn(t)
            view = out[:, ::sy, ::sx, :]
            view = jnp.tile(view, (1, 1, 1, reps))[..., : t.shape[3]]
            return t * 0.999 + 1e-6 * view.astype(t.dtype)
        return jnp.sum(lax.fori_loop(0, n, body, t).astype(jnp.float32))

    float(chain_fn(x, 1))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain_fn(x, chain))
        best = min(best, (time.perf_counter() - t0) / chain)
    rec = {"stage": label, "ms": round(best * 1e3, 3)}
    if flops:
        rec["tflops_per_s"] = round(flops / best / 1e12, 1)
    print(json.dumps(rec), flush=True)
    return best
