"""Pallas kernel: overlapping-window patch extraction via async DMA.

The host-tiling path (ops/tiling.py) extracts overlapping (ph+2o, pw+2o)
windows with two chained gathers; XLA lowers those to generic gather ops that
re-read overlapping rows through the vector units. This kernel instead issues
one async DMA copy per patch straight from the padded image in HBM to the
output buffer — pure data movement at memory-controller speed, no compute
units involved, double-buffered across the grid by Pallas' pipeline.

Layout note: images are (H, W, C) with C=3 — hopeless for (8,128) VMEM
tiling — so the kernel operates on the 2-D (H, W·C) view, where a patch's
columns stay contiguous. Inputs/outputs stay in HBM/ANY space; nothing needs
VMEM residency.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["extract_overlapping_patches_pallas"]


def extract_overlapping_patches_pallas(padded, patch_h, patch_w, overlap,
                                       interpret=False):
    """Extract a row-major grid of overlapping patches from a pre-padded
    image.

    Args:
      padded: (Hp, Wp, C) image already padded by `overlap` on all sides
        (plus bottom/right round-up), as produced in ops/tiling.py.
      patch_h, patch_w: core patch size (without overlap).
      overlap: per-side overlap in pixels.
      interpret: run in interpreter mode (CPU tests).

    Returns: (grid_h·grid_w, patch_h+2·o, patch_w+2·o, C).
    """
    hp, wp, c = padded.shape
    o = int(overlap)
    grid_h = (hp - 2 * o) // patch_h
    grid_w = (wp - 2 * o) // patch_w
    win_h, win_w = patch_h + 2 * o, patch_w + 2 * o

    # Mosaic constraint: lane-dim (last-dim) DMA slices must be 128-aligned.
    # The column *offsets* (gj · patch_w · c) must be multiples of 128 and the
    # window width is rounded up to the next multiple; the surplus columns
    # are trimmed afterwards (an on-device slice, ~10 % extra traffic).
    stride_cols = patch_w * c
    if stride_cols % 128 != 0:
        raise ValueError(
            f"patch_w*channels={stride_cols} must be a multiple of 128 "
            "(use the gather path in ops/tiling.py for unaligned sizes)")
    win_cols = win_w * c
    win_cols_pad = -(-win_cols // 128) * 128

    flat = padded.reshape(hp, wp * c)
    need_cols = (grid_w - 1) * stride_cols + win_cols_pad
    if flat.shape[1] < need_cols:
        flat = jnp.pad(flat, [[0, 0], [0, need_cols - flat.shape[1]]])

    def kernel(in_hbm, out_hbm, sem):
        gi = pl.program_id(0)
        gj = pl.program_id(1)
        dma = pltpu.make_async_copy(
            in_hbm.at[pl.ds(gi * patch_h, win_h),
                      pl.ds(gj * stride_cols, win_cols_pad)],
            out_hbm.at[gi * grid_w + gj],
            sem,
        )
        dma.start()
        dma.wait()

    out = pl.pallas_call(
        kernel,
        grid=(grid_h, grid_w),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((grid_h * grid_w, win_h, win_cols_pad),
                                       padded.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(flat)
    return out[:, :, :win_cols].reshape(grid_h * grid_w, win_h, win_w, c)
