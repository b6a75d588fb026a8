"""Pallas kernel: the entire SRResNet residual trunk resident in VMEM.

XLA's lowering of the trunk's 3×3 64-channel convs measures 26 TFLOP/s /
91 GB/s effective: 64 channels half-fill the 128-lane MXU and every
activation round-trips HBM between the 32 conv layers (XLA cost analysis
reports ~13 GB of HBM traffic per batch-16 forward from im2col read
amplification). This kernel processes one image per grid step and keeps
EVERYTHING in VMEM: the (H+2, W+2, 64) padded activation, all res-block
weights (2.4 MB bf16 at 16 blocks), and per-band im2col operands built in
registers. HBM traffic per image drops to one read + one write (~4 MB).

Round-1 history: a fully-unrolled variant (blocks × bands × taps ≈ 2.8 k
statements) was interpreter-verified but made Mosaic compilation
impractically slow. This rebuild is LOOP-STRUCTURED as VERDICT.md item 1
prescribes: `lax.fori_loop` over residual blocks and over row bands, with
the 3×3 taps grouped into five 128-lane column pairs so each conv band is
five aligned (band·W, 128) × (128, 64) MXU dots accumulated in f32 — K is
full-lane by construction instead of relying on a padded 640-wide scratch.

Semantics: a bn-free SRResNet residual trunk — per block
`x + conv2(prelu(conv1(x)))` with 3×3 SAME convs and channel-wise PReLU
(reference model_builder.py:99-134,309-319 with batch_norm=False), matching
`models/srresnet.py` ResBlock. Verified against the flax trunk in
tests/ops/test_trunk_kernel.py (interpreter mode) and driven on hardware by
scripts/bench_trunk_kernel.py.

MEASURED RESULT (v5e, batch 16 × 128² × 64, 16 blocks): 46.1 TFLOP/s at
band=32 — faster than XLA with f32 activation storage (42.0) but ~12 %
SLOWER than the production path (XLA with end-to-end bf16 activations,
52.7): the saved HBM traffic is outweighed by operand-assembly VPU work
and register spills of the f32 accumulator. Kept as a tested library op
and the record of that negative result; NOT wired into inference. Full
numbers: docs/performance.md §roofline.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["srresnet_trunk_pallas"]

_LANE = 128


def _make_kernel(num_blocks, h, w, c, band):
    """Kernel body for static (num_blocks, H, W, C, band). C must be 64
    (two 3×3 taps = one 128-lane K chunk)."""
    n_bands = h // band
    n_pairs = 5  # 9 taps + 1 zero tap → 5 × (2·C = 128) K chunks

    def kernel(x_ref, w_ref, b1_ref, b2_ref, alpha_ref, out_ref, xpad, ypad):
        # x_ref: (1, h, w, c) VMEM block of the batch input
        # w_ref: (num_blocks, 2, 5, 128, c) paired conv weights (bf16)
        # b1/b2_ref: (num_blocks, c) biases; alpha_ref: (num_blocks, c) PReLU
        # xpad/ypad: (h+2, w+2, c) bf16 activation scratch (SAME padding)
        zero_row = jnp.zeros((1, w + 2, c), jnp.bfloat16)
        zero_col = jnp.zeros((h + 2, 1, c), jnp.bfloat16)

        def clear_borders(ref):
            ref[0:1, :, :] = zero_row
            ref[h + 1:h + 2, :, :] = zero_row
            ref[:, 0:1, :] = zero_col
            ref[:, w + 1:w + 2, :] = zero_col

        clear_borders(xpad)
        clear_borders(ypad)
        xpad[1:h + 1, 1:w + 1, :] = x_ref[0].astype(jnp.bfloat16)

        def conv_band(src, blk, which, bias_ref, r0):
            """One row band of 3×3 SAME conv from padded `src`: five
            accumulated (band·w, 128) × (128, c) dots. Returns (band·w, c)
            f32 (bias added)."""
            acc = jnp.broadcast_to(
                bias_ref[blk].astype(jnp.float32)[None, :], (band * w, c))
            for pair in range(n_pairs):
                # taps 2·pair and 2·pair+1 in (dy, dx) raster order
                t0, t1 = 2 * pair, 2 * pair + 1
                lo = src[pl.ds(r0 + t0 // 3, band),
                         pl.ds(t0 % 3, w), :].reshape(band * w, c)
                if t1 < 9:
                    hi = src[pl.ds(r0 + t1 // 3, band),
                             pl.ds(t1 % 3, w), :].reshape(band * w, c)
                else:
                    hi = jnp.zeros((band * w, c), jnp.bfloat16)
                operand = jnp.concatenate(
                    [lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)], axis=-1)
                acc = acc + jnp.dot(operand, w_ref[blk, which, pair],
                                    preferred_element_type=jnp.float32)
            return acc

        def block_body(blk, _):
            alpha = alpha_ref[blk].astype(jnp.float32)[None, :]

            def band_conv1(bi, _):
                r0 = bi * band
                out = conv_band(xpad, blk, 0, b1_ref, r0)
                out = jnp.where(out >= 0.0, out, alpha * out)  # PReLU
                ypad[pl.ds(1 + r0, band), 1:w + 1, :] = \
                    out.reshape(band, w, c).astype(jnp.bfloat16)
                return 0

            jax.lax.fori_loop(0, n_bands, band_conv1, 0)

            def band_conv2(bi, _):
                r0 = bi * band
                out = conv_band(ypad, blk, 1, b2_ref, r0)
                prev = xpad[pl.ds(1 + r0, band), 1:w + 1, :].astype(jnp.float32)
                xpad[pl.ds(1 + r0, band), 1:w + 1, :] = \
                    (prev + out.reshape(band, w, c)).astype(jnp.bfloat16)
                return 0

            jax.lax.fori_loop(0, n_bands, band_conv2, 0)
            return 0

        jax.lax.fori_loop(0, num_blocks, block_body, 0)
        out_ref[0] = xpad[1:h + 1, 1:w + 1, :].astype(out_ref.dtype)

    return kernel


def _pack_weights(params, num_blocks, c):
    """Res-block params → (num_blocks, 2, 5, 128, c) tap-paired matmul
    weights (bf16) + (num_blocks, c) biases and PReLU alphas.

    Pairing: HWIO (3, 3, c, c) kernels reshape to (9, c, c) taps in (dy, dx)
    raster order; taps (2k, 2k+1) stack into one (2c=128, c) K chunk — the
    kernel builds the matching operand by concatenating the two shifted
    activation views. Tap 9 is zero padding.
    """
    w_pairs, b1s, b2s, alphas = [], [], [], []
    for blk in range(num_blocks):
        p = params[f"ResBlock_{blk}"]
        conv1 = p["ConvLayer_0"]["Conv_0"]
        conv2 = p["ConvLayer_1"]["Conv_0"]

        def to_pairs(kernel):
            taps = np.asarray(kernel, np.float32).reshape(9, c, c)
            taps = np.concatenate([taps, np.zeros((1, c, c), np.float32)])
            return taps.reshape(5, 2 * c, c)  # (pair, 128, c)

        w_pairs.append(np.stack([to_pairs(conv1["kernel"]),
                                 to_pairs(conv2["kernel"])]))
        b1s.append(np.asarray(conv1["bias"], np.float32))
        b2s.append(np.asarray(conv2["bias"], np.float32))
        alphas.append(np.asarray(p["PReLU_0"]["alpha"], np.float32))
    return (jnp.asarray(np.stack(w_pairs), jnp.bfloat16),
            jnp.asarray(np.stack(b1s), jnp.float32),
            jnp.asarray(np.stack(b2s), jnp.float32),
            jnp.asarray(np.stack(alphas), jnp.float32))


@functools.partial(jax.jit, static_argnames=("num_blocks", "band", "interpret"))
def _run(x, w, b1, b2, alpha, num_blocks, band, interpret):
    b, h, width, c = x.shape
    kernel = _make_kernel(num_blocks, h, width, c, band)
    flops = 2 * b * h * width * (9 * c) * c * 2 * num_blocks
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, width, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, width, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, width + 2, c), jnp.bfloat16),
            pltpu.VMEM((h + 2, width + 2, c), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * b * h * width * c * 2 + w.size * 2,
            transcendentals=0),
        # f32 in/out blocks + two padded bf16 scratches + weights overflow
        # the 16 MB default scoped-vmem limit at 128×128; v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w, b1, b2, alpha)


def srresnet_trunk_pallas(x, params, num_blocks=16, band=16, interpret=False):
    """Run a bn-free SRResNet residual trunk (the res blocks only — no
    post-trunk conv / global skip) on (B, H, W, 64) activations.

    Args:
      x: (B, H, W, 64) trunk input (output of the 9×9 stem conv + PReLU).
      params: SRResNet param dict containing ResBlock_i subtrees
        (batch_norm=False layout, models/srresnet.py).
      num_blocks: number of residual blocks.
      band: rows per conv band (VMEM working set / MXU M dim trade-off);
        H must be divisible by it.
      interpret: run in Pallas interpreter mode (CPU-testable).

    Returns: trunk output, same shape/dtype as x.
    """
    b, h, w, c = x.shape
    if c != 64:
        raise ValueError(f"kernel is specialized for C=64 (2 taps = 128 "
                         f"lanes); got C={c}")
    if h % band != 0:
        raise ValueError(f"H={h} not divisible by band={band}")
    packed = _pack_weights(params, num_blocks, c)
    return _run(x, *packed, num_blocks=num_blocks, band=band,
                interpret=interpret)
