"""Dissect the RRDB/ESRGAN x4 inference tail and candidate rewrites.

The RRDB tail (models/rrdb.py:102-114, parity with reference
model_builder.build_enhanced_resnet:42-96) differs from SRResNet's: after
the two subpixel stages it has an extra 3x3 64->64 conv at 4x resolution
(lrelu) and a 3x3 (not 9x9) output conv. The polyphase economics change:
a k=3 conv coarsened at s=4 inflates FLOPs 16x (vs 1.78x for the 9x9), so
the full-coarse rewrite that won for SRResNet may lose here. This script
measures the variants on chip before any implementation.

Timing: hoist-proof chained iterations (each iteration's input depends on
the previous output) — see bench.py methodology notes.

Run: python scripts/bench_rrdb_tail.py [batch] [hw] [chain]
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
    x = jnp.asarray(rng.normal(0, 0.5, (batch, hw, hw, C)), jnp.bfloat16)

    def w(*shape):
        return jnp.asarray(rng.normal(0, 0.05, shape), jnp.bfloat16)

    def cv(t, k, dt=None):
        return lax.conv_general_dilated(
            t.astype(dt or t.dtype), k.astype(dt or t.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt or t.dtype)

    lrelu = lambda t: jnp.where(t >= 0, t, 0.2 * t)

    w_up1 = w(3, 3, C, 4 * C)
    w_up2 = w(3, 3, C, 4 * C)
    w_hr = w(3, 3, C, C)
    w_out = w(3, 3, C, 3)

    f_up1 = 2 * batch * hw * hw * 9 * C * 4 * C
    f_up2 = 4 * f_up1
    f_hr = 2 * batch * (4 * hw) ** 2 * 9 * C * C
    f_out = 2 * batch * (4 * hw) ** 2 * 9 * C * 3

    # --- A: production lowering (subpixel+lrelu x2, hr conv, out conv)
    def tail_prod(t):
        t = lrelu(depth_to_space(cv(t, w_up1), 2))
        t = lrelu(depth_to_space(cv(t, w_up2), 2))
        t = lrelu(cv(t, w_hr))
        return jnp.tanh(cv(t, w_out, jnp.float32))
    _measure(tail_prod, x, "A_production", chain, f_up1 + f_up2 + f_hr + f_out)

    # --- B: polyphase subpixel stages at LR, one d2s(4), fine hr/out at 4x
    w_up2c = w(3, 3, 4 * C, 16 * C)      # coarsened s=2 (4x FLOPs)
    def tail_poly_up(t):
        t = lrelu(cv(t, w_up1))          # (hw, hw, 256)
        t = lrelu(cv(t, w_up2c))         # (hw, hw, 1024)
        t = depth_to_space(t, 4)         # (4hw, 4hw, 64)
        t = lrelu(cv(t, w_hr))
        return jnp.tanh(cv(t, w_out, jnp.float32))
    _measure(tail_poly_up, x, "B_poly_up_fine_hr", chain,
             f_up1 + 4 * f_up1 * 4 + f_hr + f_out)

    # --- C: full coarse (hr conv 1024->1024 = 16x FLOPs)
    w_hrc = w(3, 3, 16 * C, 16 * C)
    w_outc = w(3, 3, 16 * C, 48)
    f_hrc = 2 * batch * hw * hw * 9 * 16 * C * 16 * C
    f_outc = 2 * batch * hw * hw * 9 * 16 * C * 48
    def tail_full_coarse(t):
        t = lrelu(cv(t, w_up1))
        t = lrelu(cv(t, w_up2c))
        t = lrelu(cv(t, w_hrc))
        t = cv(t, w_outc, jnp.float32)
        return jnp.tanh(depth_to_space(t, 4))
    _measure(tail_full_coarse, x, "C_full_coarse", chain,
             f_up1 + 4 * f_up1 * 4 + f_hrc + f_outc)

    # --- D: 2-phase hybrid — up stages coarse to LR, d2s(2), hr/out at 2x
    # in 2-phase form (256ch): 4x FLOPs each, full-lane shapes
    w_hr2 = w(3, 3, 4 * C, 4 * C)
    w_out2 = w(3, 3, 4 * C, 12)
    f_hr2 = 2 * batch * (2 * hw) ** 2 * 9 * 4 * C * 4 * C
    f_out2 = 2 * batch * (2 * hw) ** 2 * 9 * 4 * C * 12
    def tail_2phase(t):
        t = lrelu(cv(t, w_up1))
        t = lrelu(cv(t, w_up2c))         # (hw, hw, 1024)
        t = depth_to_space(t, 2)         # (2hw, 2hw, 256)
        t = lrelu(cv(t, w_hr2))
        t = cv(t, w_out2, jnp.float32)
        return jnp.tanh(depth_to_space(t, 2))
    _measure(tail_2phase, x, "D_2phase_hybrid", chain,
             f_up1 + 4 * f_up1 * 4 + f_hr2 + f_out2)

    # --- E: B but with coarse out conv only (hr stays fine at 4x)
    def tail_poly_out(t):
        t = lrelu(cv(t, w_up1))
        t = lrelu(cv(t, w_up2c))
        t = depth_to_space(t, 4)
        t = lrelu(cv(t, w_hr))
        from simplesr_tpu.ops.shuffle import space_to_depth
        t = space_to_depth(t, 4)
        t = cv(t, w_outc, jnp.float32)
        return jnp.tanh(depth_to_space(t, 4))
    _measure(tail_poly_out, x, "E_poly_up_fine_hr_coarse_out", chain,
             f_up1 + 4 * f_up1 * 4 + f_hr + f_outc)

    # isolation
    _measure(lambda t: lrelu(cv(t, w_hr)),
             jnp.asarray(rng.normal(0, 0.5, (batch, 4 * hw, 4 * hw, C)),
                         jnp.bfloat16),
             "hr_conv_64to64@4x", chain, f_hr)
    _measure(lambda t: jnp.tanh(cv(t, w_out, jnp.float32)),
             jnp.asarray(rng.normal(0, 0.5, (batch, 4 * hw, 4 * hw, C)),
                         jnp.bfloat16),
             "out_conv_64to3@4x", chain, f_out)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
