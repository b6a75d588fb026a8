"""Pallas kernel: the entire SRResNet residual trunk resident in VMEM.

XLA's lowering of the trunk's 3×3 64-channel convs is both bandwidth- and
MXU-starved: its cost analysis reports ~13 GB of HBM traffic per batch-16
forward (im2col read amplification) and the convs measure 26 TFLOP/s / 91
GB/s effective — 64 channels half-fill the 128-lane MXU and every activation
round-trips HBM between layers.

This kernel instead processes one image per grid step and keeps EVERYTHING in
VMEM: the (H+2, W+2, 64) activation, all 16 res blocks' weights (2.4 MB
bf16), and an im2col band scratch. Each conv is computed band-by-band as a
(band·W, 9·64→640-padded) × (640, 64) matmul — K=640 fills the MXU lanes —
with PReLU and residual adds fused in place. HBM traffic per image drops from
~800 MB to 4 MB (one read + one write).

Status: EXPERIMENTAL — semantics verified in interpreter mode
(tests/ops/test_trunk_kernel.py); the roofline analysis in
docs/performance.md caps its possible win at ~10–20 % (the binding
constraint is MXU lane fill at C=64, not bandwidth), and the fully-unrolled
body (blocks × bands × taps ≈ 2.8 k statements) makes the Mosaic compile
impractically slow. A compiled variant would need `lax.fori_loop`-based
banding with aligned dynamic slices. Not wired into the inference path.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["srresnet_trunk_pallas"]

_LANE = 128
_K_PAD = 640  # 9 taps × 64 ch = 576, padded to a lane multiple


def _make_kernel(num_blocks, h, w, c, band, alpha_blocks):
    """Build the kernel body for static (num_blocks, H, W, C, band)."""
    n_bands = h // band
    kw = 3

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, alpha_ref, out_ref,
               xpad, ypad, col, acc):
        # x_ref: (1, h, w, c) VMEM block; weights: (num_blocks, 640, c) etc.
        # xpad/ypad: (h+2, w+2, c) activation scratch (bf16)
        # col: (band*w, 640) im2col scratch (bf16); acc: (band*w, c) f32

        def _zero_pad_borders(ref):
            ref[0, :, :] = jnp.zeros((w + 2, c), jnp.bfloat16)
            ref[h + 1, :, :] = jnp.zeros((w + 2, c), jnp.bfloat16)
            ref[:, 0, :] = jnp.zeros((h + 2, c), jnp.bfloat16)
            ref[:, w + 1, :] = jnp.zeros((h + 2, c), jnp.bfloat16)

        _zero_pad_borders(xpad)
        xpad[1:h + 1, 1:w + 1, :] = x_ref[0].astype(jnp.bfloat16)

        def conv_band(src, wmat, bias, band_idx, apply_prelu, alpha):
            """One band of 3×3 SAME conv from padded src; returns (band*w, c) f32."""
            r0 = band_idx * band
            # assemble im2col: taps at (dy, dx) → columns [(dy*3+dx)*c : +c]
            for dy in range(3):
                for dx in range(3):
                    tap = src[r0 + dy:r0 + dy + band, dx:dx + w, :]
                    col[:, (dy * kw + dx) * c:(dy * kw + dx + 1) * c] = \
                        tap.reshape(band * w, c)
            col[:, 9 * c:] = jnp.zeros((band * w, _K_PAD - 9 * c), jnp.bfloat16)
            out = jnp.dot(col[:, :], wmat, preferred_element_type=jnp.float32)
            out = out + bias
            if apply_prelu:
                out = jnp.where(out >= 0, out, alpha * out)
            return out

        for blk in range(num_blocks):
            w1 = w1_ref[blk]
            b1 = b1_ref[blk]
            w2 = w2_ref[blk]
            b2 = b2_ref[blk]
            alpha = alpha_ref[blk] if alpha_blocks else None
            # conv1 + PReLU → ypad interior
            _zero_pad_borders(ypad)
            for bi in range(n_bands):
                out = conv_band(xpad, w1, b1, bi, True, alpha)
                ypad[1 + bi * band:1 + (bi + 1) * band, 1:w + 1, :] = \
                    out.reshape(band, w, c).astype(jnp.bfloat16)
            # conv2 + residual add → xpad interior
            for bi in range(n_bands):
                out = conv_band(ypad, w2, b2, bi, False, None)
                r0 = 1 + bi * band
                prev = xpad[r0:r0 + band, 1:w + 1, :].astype(jnp.float32)
                xpad[r0:r0 + band, 1:w + 1, :] = \
                    (prev + out.reshape(band, w, c)).astype(jnp.bfloat16)

        out_ref[0] = xpad[1:h + 1, 1:w + 1, :].astype(out_ref.dtype)

    return kernel


def _pack_weights(params, num_blocks, c):
    """Res-block params → (num_blocks, 640, c) matmul weights + biases +
    PReLU alphas, im2col column order [(dy*3+dx)*c + cin]."""
    w1s, b1s, w2s, b2s, alphas = [], [], [], [], []
    for blk in range(num_blocks):
        p = params[f"ResBlock_{blk}"]
        conv1 = p["ConvLayer_0"]["Conv_0"]
        conv2 = p["ConvLayer_1"]["Conv_0"]
        alpha = p["PReLU_0"]["alpha"]

        def to_mat(kernel):  # (3, 3, c, c) HWIO → (640, c)
            k = np.asarray(kernel, np.float32).reshape(9 * c, c)
            return np.pad(k, [(0, _K_PAD - 9 * c), (0, 0)])

        w1s.append(to_mat(conv1["kernel"]))
        b1s.append(np.asarray(conv1["bias"], np.float32))
        w2s.append(to_mat(conv2["kernel"]))
        b2s.append(np.asarray(conv2["bias"], np.float32))
        alphas.append(np.asarray(alpha, np.float32))
    return (jnp.asarray(np.stack(w1s), jnp.bfloat16),
            jnp.asarray(np.stack(b1s), jnp.float32),
            jnp.asarray(np.stack(w2s), jnp.bfloat16),
            jnp.asarray(np.stack(b2s), jnp.float32),
            jnp.asarray(np.stack(alphas), jnp.float32))


@functools.partial(jax.jit, static_argnames=("num_blocks", "band", "interpret"))
def _run(x, w1, b1, w2, b2, alpha, num_blocks, band, interpret):
    b, h, w, c = x.shape
    kernel = _make_kernel(num_blocks, h, w, c, band, alpha_blocks=True)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, c), jnp.bfloat16),
            pltpu.VMEM((h + 2, w + 2, c), jnp.bfloat16),
            pltpu.VMEM((band * w, _K_PAD), jnp.bfloat16),
            pltpu.VMEM((band * w, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, w1, b1, w2, b2, alpha)


def srresnet_trunk_pallas(x, params, num_blocks=16, band=16, interpret=False):
    """Run a bn-free SRResNet residual trunk (the 16 ResBlocks, without the
    post-trunk conv/global skip) on (B, H, W, 64) activations.

    Args:
      x: (B, H, W, 64) trunk input (output of the 9×9 stem conv + PReLU).
      params: the SRResNet param dict (containing ResBlock_i subtrees,
        batch_norm=False layout).
      num_blocks: number of residual blocks.
      band: rows per im2col band; H must be divisible by it.

    Returns: trunk output, same shape/dtype as x.
    """
    b, h, w, c = x.shape
    if h % band != 0:
        raise ValueError(f"H={h} not divisible by band={band}")
    packed = _pack_weights(params, num_blocks, c)
    return _run(x, *packed, num_blocks=num_blocks, band=band,
                interpret=interpret)
