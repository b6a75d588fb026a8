"""Dissect the SRResNet ×4 inference tail (subpixel upsample + output conv).

The experiment that produced the polyphase serving tail
(models/polyphase.py): measures each tail stage in isolation on the real
chip (conv MXU shape? depth_to_space relayout? PReLU fusion?) and the
candidate rewrites. Findings (v5e, batch 16×128², recorded in
docs/performance.md): the tail is ~39 ms of the ~52 ms forward; the dense
full-polyphase rewrite wins (12.5 ms); phase-split loses (21.6 ms).

Run: python scripts/bench_upsample_tail.py [batch] [hw] [chain]
Prints one JSON line per variant.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from simplesr_tpu.ops.shuffle import depth_to_space
from bench_timing import chained_measure

C = 64


_measure = chained_measure

def main(batch=16, hw=128, chain=20):
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    x = jnp.asarray(rng.normal(0, 0.5, (batch, hw, hw, C)), jnp.bfloat16)

    def conv(x, cout, k=3):
        w = jnp.asarray(rng.normal(0, 0.05, (k, k, x.shape[-1], cout)), jnp.bfloat16)
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    w1 = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, 4 * C)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, 4 * C)), jnp.bfloat16)
    wout = jnp.asarray(rng.normal(0, 0.05, (9, 9, C, 3)), jnp.bfloat16)
    a1 = jnp.asarray(rng.uniform(0.1, 0.3, (C,)), jnp.bfloat16)
    a2 = jnp.asarray(rng.uniform(0.1, 0.3, (C,)), jnp.bfloat16)

    def cv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    def prelu(x, a):
        return jnp.where(x >= 0, x, a * x)

    f_conv1 = 2 * batch * hw * hw * 9 * C * 4 * C
    f_conv2 = 2 * batch * (2 * hw) ** 2 * 9 * C * 4 * C
    f_out = 2 * batch * (4 * hw) ** 2 * 81 * C * 3

    # --- stage isolation
    _measure(lambda t: cv(t, w1), x, "conv1_64to256@LR", chain, f_conv1)
    _measure(lambda t: depth_to_space(cv(t, w1), 2), x, "conv1+d2s", chain, f_conv1)
    _measure(lambda t: prelu(depth_to_space(cv(t, w1), 2), a1), x,
             "conv1+d2s+prelu", chain, f_conv1)

    y = prelu(depth_to_space(cv(x, w1), 2), a1)
    y = jax.device_put(y)
    _measure(lambda t: cv(t, w2), y, "conv2_64to256@2x", chain, f_conv2)
    _measure(lambda t: prelu(depth_to_space(cv(t, w2), 2), a2), y,
             "conv2+d2s+prelu", chain, f_conv2)

    z = prelu(depth_to_space(cv(y, w2), 2), a2)
    z = jax.device_put(z)
    _measure(lambda t: cv(t, wout), z, "out_9x9_64to3@4x", chain, f_out)

    # --- full tail, architecture order (the production lowering)
    def tail(t):
        t = prelu(depth_to_space(cv(t, w1), 2), a1)
        t = prelu(depth_to_space(cv(t, w2), 2), a2)
        return jnp.tanh(cv(t, wout).astype(jnp.float32))
    _measure(tail, x, "full_tail_production", chain, f_conv1 + f_conv2 + f_out)

    # --- rewrite A: PReLU before d2s (alpha repeated per phase; identical fn)
    a1r = jnp.tile(a1, 4)
    a2r = jnp.tile(a2, 4)

    def tail_prelu_first(t):
        t = depth_to_space(prelu(cv(t, w1), a1r), 2)
        t = depth_to_space(prelu(cv(t, w2), a2r), 2)
        return jnp.tanh(cv(t, wout).astype(jnp.float32))
    _measure(tail_prelu_first, x, "tail_prelu_before_d2s", chain,
             f_conv1 + f_conv2 + f_out)

    # --- rewrite B: output conv in coarse space (one d2s at the very end).
    # The 9x9 conv at 4x resolution becomes a 3x3 conv on the (C*16)-channel
    # coarse tensor producing 3*16 phase channels: N=48 instead of 3, no
    # 512^2 activations until the final relayout. FLOPs grow 1.78x but the
    # MXU shape improves ~16x.
    # (weights here are random — this measures lowering cost, not parity)
    wout_c = jnp.asarray(rng.normal(0, 0.05, (3, 3, 16 * C, 48)), jnp.bfloat16)
    f_out_c = 2 * batch * hw * hw * 9 * 16 * C * 48

    def tail_coarse_out(t):
        t = prelu(cv(t, w1), a1r)                    # (hw, hw, 256)
        # conv2 must see the 2x-res tensor; keep it, then s2d back for the
        # coarse output conv.
        t = depth_to_space(t, 2)
        t = prelu(cv(t, w2), a2r)                    # (2hw, 2hw, 256)
        from simplesr_tpu.ops.shuffle import space_to_depth
        t = space_to_depth(t, 2)                     # (hw, hw, 1024)
        t = cv(t, wout_c)                            # (hw, hw, 48)
        return jnp.tanh(depth_to_space(t, 4).astype(jnp.float32))
    _measure(tail_coarse_out, x, "tail_coarse_output_conv", chain,
             f_conv1 + f_conv2 + f_out_c)

    # --- rewrite C: full polyphase — every conv at LR, ONE final d2s(4).
    # conv2 (3x3 64->256 at 2x) becomes a dense coarse 3x3 256->1024 at LR:
    # 4x the FLOPs (the dense coarse kernel is structurally 2/3 zeros per
    # phase) but full-lane MXU shapes and zero intermediate relayouts.
    w2c = jnp.asarray(rng.normal(0, 0.05, (3, 3, 4 * C, 16 * C)), jnp.bfloat16)
    woutc2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 16 * C, 48)), jnp.bfloat16)
    a2c = jnp.tile(a2, 16)
    f_conv2c = 2 * batch * hw * hw * 9 * 4 * C * 16 * C

    def tail_full_polyphase(t):
        t = prelu(cv(t, w1), a1r)                    # (hw, hw, 256)
        t = prelu(cv(t, w2c), a2c)                   # (hw, hw, 1024)
        t = cv(t, woutc2)                            # (hw, hw, 48)
        return jnp.tanh(depth_to_space(t, 4).astype(jnp.float32))
    _measure(tail_full_polyphase, x, "tail_full_polyphase", chain,
             f_conv1 + f_conv2c + f_out_c)

    # --- rewrite D: full polyphase with PHASE-SPLIT coarse convs.
    # The dense coarse kernels are 3/4 (up2) and 7/9 (out) structural
    # zeros; splitting by output phase into per-phase convs with only the
    # live taps removes the wasted FLOPs at the cost of more dispatches +
    # a channel concat. (timing shape only — random weights)
    w2s = [jnp.asarray(rng.normal(0, 0.05, (2, 2, 4 * C, 4 * C)), jnp.bfloat16)
           for _ in range(4)]
    wouts = [jnp.asarray(rng.normal(0, 0.05, (2, 2, 16 * C, 3)), jnp.bfloat16)
             for _ in range(16)]
    f_conv2_split = 4 * 2 * batch * hw * hw * 4 * 4 * C * 4 * C
    f_out_split = 16 * 2 * batch * hw * hw * 4 * 16 * C * 3

    def tail_phase_split(t):
        t = prelu(cv(t, w1), a1r)                     # (hw, hw, 256)
        t = jnp.concatenate([cv(t, wp) for wp in w2s], axis=-1)
        t = prelu(t, jnp.tile(a2, 16))                # (hw, hw, 1024)
        t = jnp.concatenate([cv(t, wp) for wp in wouts], axis=-1)
        return jnp.tanh(depth_to_space(t, 4).astype(jnp.float32))
    _measure(tail_phase_split, x, "tail_phase_split", chain,
             f_conv1 + f_conv2_split + f_out_split)

    # --- relayout isolation: what does depth_to_space itself cost?
    big = jnp.asarray(rng.normal(0, 0.5, (batch, 2 * hw, 2 * hw, 4 * C)),
                      jnp.bfloat16)
    _measure(lambda t: depth_to_space(t, 2), big, "d2s_only_256ch@2x", chain)
    small = jnp.asarray(rng.normal(0, 0.5, (batch, hw, hw, 48)), jnp.bfloat16)
    _measure(lambda t: depth_to_space(t, 4), small, "d2s4_only_48ch@LR", chain)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
