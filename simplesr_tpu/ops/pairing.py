"""Batch→channel pairing: an exact weight-space rewrite for lane fill.

Motivation (docs/performance.md rooflines): the SRResNet trunk's 3×3
C=64→64 convs half-fill the 128-lane MXU in both contraction and output
dims and measure ~53 TFLOP/s, while the same conv at C=128 measures
155 TFLOP/s (79 % MXU). Packing `w` images into the channel dimension and
expanding every trunk kernel block-diagonally turns each C→C conv into a
wC→wC conv that fills the lanes. The block-diagonal kernel embeds
structural zeros — the MXU executes w× the MACs — but at w=2 the measured
C=128 rate is ~2.9× the C=64 rate, so useful throughput still rises ~1.46×
(the same trade the polyphase tail rewrite makes, ops/polyphase.py).

The rewrite is EXACT: convolution is linear, so a block-diagonal kernel
computes stream j's convolution on channels [jC, (j+1)C) with no
cross-talk, and every per-channel op (bias, PReLU, BatchNorm inference
affine) tiles across streams. Only f32 summation order inside the larger
contraction differs.

No reference counterpart (the reference targets a CUDA GPU where cuDNN's
implicit-GEMM handles C=64 efficiently); this is TPU-native MXU geometry.
"""

import numpy as np
import jax.numpy as jnp

__all__ = ["pack_batch", "unpack_batch", "blockdiag_kernel",
           "blockdiag_kernel_segmented", "pair_param_tree"]


def pack_batch(x, ways: int):
    """[w·g, H, W, C] → [g, H, W, w·C]; batch items (w·i … w·i+w−1) become
    group i with item j occupying channels [j·C, (j+1)·C)."""
    if x.shape[0] % ways:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by ways={ways}")
    g = x.shape[0] // ways
    h, w_, c = x.shape[1:]
    x = x.reshape(g, ways, h, w_, c)
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(g, h, w_, ways * c)


def unpack_batch(x, ways: int):
    """Inverse of `pack_batch`: [g, H, W, w·C] → [w·g, H, W, C] in the
    original batch order."""
    g, h, w_, wc = x.shape
    if wc % ways:
        raise ValueError(f"channels {wc} not divisible by ways={ways}")
    c = wc // ways
    x = x.reshape(g, h, w_, ways, c)
    return jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(g * ways, h, w_, c)


def blockdiag_kernel(kernel: np.ndarray, ways: int) -> np.ndarray:
    """(kh, kw, Cin, Cout) → (kh, kw, w·Cin, w·Cout) with `kernel` on the
    (Cin, Cout) block diagonal — stream j convolves only with stream j.
    The single-segment case of `blockdiag_kernel_segmented`."""
    return blockdiag_kernel_segmented(kernel, ways, [kernel.shape[2]])


def blockdiag_kernel_segmented(kernel: np.ndarray, ways: int,
                               in_segments) -> np.ndarray:
    """Block-diagonal expansion for convs whose input is a CONCAT of
    separately-packed tensors (RRDB dense blocks).

    When each concatenated tensor is itself in packed layout (stream j in
    channel block j), the concat's channel axis is segment-major:
    [seg₁·w | seg₂·w | …], with stream j occupying [j·s, (j+1)·s) INSIDE
    each w·s-wide segment. The expanded kernel routes exactly those slices
    to stream j's output block; everything else is a structural zero.

    `in_segments` lists the original per-stream segment sizes, in concat
    order; they must sum to the kernel's Cin."""
    kh, kw, cin, cout = kernel.shape
    if sum(in_segments) != cin:
        raise ValueError(f"segments {in_segments} sum to {sum(in_segments)}"
                         f" != kernel Cin {cin}")
    out = np.zeros((kh, kw, ways * cin, ways * cout), kernel.dtype)
    for j in range(ways):
        off = 0  # offset into the original (per-stream) input dim
        for s in in_segments:
            paired_off = ways * off + j * s
            out[:, :, paired_off:paired_off + s,
                j * cout:(j + 1) * cout] = kernel[:, :, off:off + s, :]
            off += s
    return out


def pair_param_tree(tree, ways: int):
    """Expand a trunk parameter/batch-stats subtree `ways`-fold: 4-d conv
    kernels go block-diagonal, per-channel 1-d vectors (bias, PReLU alpha,
    BatchNorm scale/bias/mean/var) tile across streams. Structure and key
    names are preserved."""
    if isinstance(tree, dict):
        return {k: pair_param_tree(v, ways) for k, v in tree.items()}
    arr = np.asarray(tree)
    if arr.ndim == 4:
        return jnp.asarray(blockdiag_kernel(arr, ways))
    if arr.ndim == 1:
        return jnp.asarray(np.tile(arr, ways))
    raise ValueError(
        f"don't know how to pair a rank-{arr.ndim} trunk parameter")
