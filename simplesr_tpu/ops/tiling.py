"""Overlap tiling for memory-efficient large-image inference.

API parity with reference image_utils.segment_into_patches /
reconstruct_from_(overlapping_)patches
(/root/reference/simple_sr/utils/image/image_utils.py:40-184): images larger
than the model's working size are zero-padded, cut into a row-major grid of
(ph+2·o, pw+2·o) patches, upscaled patch-wise, overlap-cropped, and stitched
seam-free.

TPU-native design notes:
  * Tiling makes inference shapes *static* — every patch is the same size, so
    one jit cache entry serves arbitrarily large images (SURVEY.md §7 hard
    part #5).
  * Segmentation is two separable contiguous gathers (rows then cols), not
    TF's space_to_batch/split/stack dance; reconstruction is a pure
    reshape/transpose that XLA lowers to a layout change.
  * The reference steps its overlap grid by patch_width along rows and
    patch_height along cols (image_utils.py:139-140) — harmless for the
    square patches it always uses, swapped for rectangular ones. Here rows
    step by patch_height and cols by patch_width.
"""

import jax.numpy as jnp

__all__ = [
    "segment_into_patches",
    "reconstruct_from_patches",
    "reconstruct_from_overlapping_patches",
]


def _pad_amounts(h, w, patch_h, patch_w, overlap):
    top = left = overlap
    bottom = overlap + (-h) % patch_h
    right = overlap + (-w) % patch_w
    return [top, bottom], [left, right]


def segment_into_patches(tensor, patch_width=32, patch_height=32, pixel_overlap=0):
    """Segment an HWC (or 1HWC) image into a row-major grid of patches.

    Returns (patches, padding) with patches of shape
    (grid_h*grid_w, patch_height+2·o, patch_width+2·o, C) and padding
    [[rows_top, rows_bottom], [cols_left, cols_right]] — same contract as the
    reference (image_utils.py:85-121).
    """
    if tensor.ndim == 4:
        if tensor.shape[0] != 1:
            raise ValueError("Tensor must be of rank 3")
        tensor = tensor[0]
    if tensor.ndim != 3:
        raise ValueError("Tensor must be of rank 3")
    h, w, c = tensor.shape
    if h < patch_height or w < patch_width:
        raise ValueError("Patch dimensions are larger than image size")

    o = int(pixel_overlap)
    (top, bottom), (left, right) = _pad_amounts(h, w, patch_height, patch_width, o)
    padded = jnp.pad(tensor, [[top, bottom], [left, right], [0, 0]])
    hp, wp = padded.shape[0], padded.shape[1]
    grid_h = (hp - 2 * o) // patch_height
    grid_w = (wp - 2 * o) // patch_width

    if o == 0:
        patches = padded.reshape(grid_h, patch_height, grid_w, patch_width, c)
        patches = patches.transpose(0, 2, 1, 3, 4).reshape(-1, patch_height, patch_width, c)
        return patches, [[top, bottom], [left, right]]

    # TPU fast path: per-patch async-DMA extraction (ops/pallas) — ~1.6×
    # the gather path's effective bandwidth. Needs lane-aligned strides.
    import jax as _jax
    if (_jax.default_backend() not in ("cpu",)
            and (patch_width * c) % 128 == 0):
        from simplesr_tpu.ops.pallas import extract_overlapping_patches_pallas
        patches = extract_overlapping_patches_pallas(
            padded, patch_height, patch_width, o)
        return patches, [[top, bottom], [left, right]]

    # Separable overlapping-window gather: row strips, then column windows.
    row_starts = jnp.arange(grid_h) * patch_height
    col_starts = jnp.arange(grid_w) * patch_width
    row_idx = row_starts[:, None] + jnp.arange(patch_height + 2 * o)[None, :]
    col_idx = col_starts[:, None] + jnp.arange(patch_width + 2 * o)[None, :]
    strips = padded[row_idx]            # (grid_h, ph+2o, wp, c)
    patches = strips[:, :, col_idx]     # (grid_h, ph+2o, grid_w, pw+2o, c)
    patches = patches.transpose(0, 2, 1, 3, 4).reshape(
        grid_h * grid_w, patch_height + 2 * o, patch_width + 2 * o, c
    )
    return patches, [[top, bottom], [left, right]]


def reconstruct_from_patches(patches, original_height, original_width,
                             horizontal_padding=0, vertical_padding=0):
    """Stitch non-overlapping row-major patches back into an HWC image.

    ``horizontal_padding``/``vertical_padding`` are the *bottom/right* pad
    amounts applied at segmentation time (reference image_utils.py:64-82).
    """
    if patches.ndim != 4:
        raise ValueError("Tensor with patches needs to be of rank 4")
    if horizontal_padding < 0 or vertical_padding < 0:
        raise ValueError("Padding can't be negative")
    ph, pw, c = patches.shape[1], patches.shape[2], patches.shape[3]
    padded_h = original_height + horizontal_padding
    padded_w = original_width + vertical_padding
    grid_h, grid_w = padded_h // ph, padded_w // pw
    img = patches.reshape(grid_h, grid_w, ph, pw, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(padded_h, padded_w, c)
    return img[:original_height, :original_width, :]


def reconstruct_from_overlapping_patches(patches, image_height, image_width,
                                         pixel_overlap, horizontal_padding,
                                         vertical_padding):
    """Crop each patch's overlap margin, then stitch (reference
    image_utils.py:40-61). Padding args are the bottom/right *extra* padding
    beyond the overlap (i.e. ``padding[i][1] - overlap`` from segmentation —
    the reference passes its eval-time values the same way,
    operations/evaluation.py:269-274)."""
    if patches.ndim != 4:
        raise ValueError("Tensor with patches needs to be of rank 4")
    o = int(pixel_overlap)
    inner = patches[:, o:-o, o:-o, :] if o else patches
    return reconstruct_from_patches(
        inner, image_height, image_width, horizontal_padding, vertical_padding
    )


def tiled_apply(fn, image, patch_size, overlap, scale, batch_size=16):
    """Memory-efficient SR of a large HWC image: segment → fn per patch batch
    → seam-free stitch. ``fn`` maps (N, ph+2o, pw+2o, C) → (N, s·(ph+2o),
    s·(pw+2o), C). This is the one-call equivalent of the reference's eval
    path (operations/evaluation.py:256-276).
    """
    return tiled_apply_many(fn, [image], patch_size, overlap, scale,
                            batch_size=batch_size)[0]


def tiled_apply_many(fn, images, patch_size, overlap, scale, batch_size=16):
    """Tiled SR of SEVERAL large HWC images (sizes may differ — the patch
    shape is static regardless), streaming ALL their patches through ``fn``
    in shared fixed-size chunks.

    The reference upscales patch-by-patch per image in a Python loop
    (operations/evaluation.py:351-359); per-image chunking wastes up to
    ``batch_size - 1`` padded patch slots *per image* on the ragged final
    chunk. Pooling the patch streams leaves at most one partial chunk for
    the whole set, so multi-image tiled eval keeps full MXU batches.

    Returns the stitched outputs in input order.
    """
    if isinstance(patch_size, (int, float)):
        ph = pw = int(patch_size)
    else:
        ph, pw = int(patch_size[0]), int(patch_size[1])
    metas, streams = [], []
    for image in images:
        patches, padding = segment_into_patches(image, pw, ph, overlap)
        metas.append((image.shape, padding, patches.shape[0]))
        streams.append(patches)
    pooled = streams[0] if len(streams) == 1 else jnp.concatenate(streams)
    outs = []
    n = pooled.shape[0]
    for i in range(0, n, batch_size):
        chunk = pooled[i:i + batch_size]
        if chunk.shape[0] < batch_size:  # keep shapes static for jit reuse
            pad_n = batch_size - chunk.shape[0]
            chunk = jnp.concatenate([chunk, jnp.zeros((pad_n,) + chunk.shape[1:], chunk.dtype)])
            outs.append(fn(chunk)[: batch_size - pad_n])
        else:
            outs.append(fn(chunk))
    sr_patches = jnp.concatenate(outs, axis=0)
    s = int(scale)
    results, offset = [], 0
    for (h, w, _), padding, count in metas:
        results.append(reconstruct_from_overlapping_patches(
            sr_patches[offset:offset + count], h * s, w * s, overlap * s,
            (padding[0][1] - overlap) * s, (padding[1][1] - overlap) * s,
        ))
        offset += count
    return results
