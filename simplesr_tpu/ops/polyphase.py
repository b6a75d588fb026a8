"""Polyphase (phase-space) transforms for subpixel-upsampling networks.

The SR generator tails (reference model_builder._subpixel_conv_block +
final 9x9 conv, /root/reference/simple_sr/utils/models/model_builder.py:
132-134,275-282) run convolutions at 2x/4x output resolution with few
channels. On TPU that is the worst possible MXU shape: the final 9x9 conv
to 3 channels uses 3 of the 128 systolic-array lanes (~3.6 TFLOP/s
measured, scripts/bench_upsample_tail.py), and each depth_to_space is a
sublane-shuffling relayout that costs ~8x a straight HBM copy.

These helpers rewrite the tail *exactly* in weight space so that every conv
runs at LR resolution on the DCR phase tensor with full-lane channel
counts, and a single depth_to_space at the very end produces the HR image:

    conv_fine(d2s(U, s), K)  ==  d2s(conv_coarse(U, coarsen(K, s)), s)

for any stride-1 SAME conv with odd k. Identity: output fine pixel
(s*i + p, s*j + q) reads fine input (s*(i+dc) + p', s*(j+dc') + q') at
kernel tap d = s*dc + p' - p + k//2; embedding K's taps at those offsets
into a kc x kc coarse kernel over s^2-grouped channels (zeros where the
tap falls outside K) reproduces the computation exactly, including SAME
zero-padding semantics. FLOPs grow by the density of the embedding, but
the MXU shapes improve far more (measured 3.1x on the SRResNet x4 tail).

All functions are host-side (numpy) weight transforms, run once at model
load; nothing here appears in the compiled program.
"""

import numpy as np

__all__ = [
    "coarsen_conv_kernel",
    "coarse_kernel_taps",
    "phase_merge_permutation",
    "phase_split_permutation",
    "tile_phase",
]


def coarse_kernel_taps(k, scale):
    """Coarse kernel size kc for a fine k x k conv at phase scale `scale`:
    smallest odd kc whose coarse taps cover all fine offsets |d| <= k//2."""
    if k % 2 != 1:
        raise ValueError(f"only odd kernels supported, got k={k}")
    return 2 * ((k // 2 + scale - 1) // scale) + 1


def coarsen_conv_kernel(kernel, scale, bias=None):
    """Embed a fine HWIO kernel (k,k,Cin,Cout) acting at `scale`x resolution
    into the equivalent coarse kernel (kc,kc,scale^2*Cin,scale^2*Cout)
    acting on the DCR phase tensor (depth_to_space channel order:
    channel = (py*scale + px)*C + c).

    Returns (coarse_kernel, coarse_bias) — coarse_bias is the phase-tiled
    bias (or None if bias is None).
    """
    kernel = np.asarray(kernel)
    k, kw, cin, cout = kernel.shape
    if k != kw:
        raise ValueError(f"square kernels only, got {kernel.shape}")
    s = int(scale)
    kc = coarse_kernel_taps(k, s)
    half, chalf = k // 2, kc // 2

    out = np.zeros((kc, kc, s * s * cin, s * s * cout), kernel.dtype)
    for dcy in range(-chalf, chalf + 1):
        for dcx in range(-chalf, chalf + 1):
            for pin in range(s * s):
                piy, pix = divmod(pin, s)
                for pout in range(s * s):
                    poy, pox = divmod(pout, s)
                    dy = s * dcy + piy - poy + half
                    dx = s * dcx + pix - pox + half
                    if 0 <= dy < k and 0 <= dx < k:
                        out[dcy + chalf, dcx + chalf,
                            pin * cin:(pin + 1) * cin,
                            pout * cout:(pout + 1) * cout] = kernel[dy, dx]
    cbias = None if bias is None else tile_phase(bias, s)
    return out, cbias


def phase_merge_permutation(s_in, upsample, channels):
    """Channel permutation that converts the *nested* phase order — an
    s_in-phase tensor whose per-pixel channels are themselves DCR groups for
    a further depth_to_space(upsample) — into the *direct* DCR order for one
    depth_to_space(s_in * upsample).

    nested channel:  ((i*s_in + j) * u^2 + (a*u + b)) * C + c
    direct channel:  ((i*u + a) * (s_in*u) + (j*u + b)) * C + c

    Returns an index array `perm` with  direct = nested[..., perm].
    """
    s, u, c = int(s_in), int(upsample), int(channels)
    big = s * u
    perm = np.empty(big * big * c, np.int64)
    for i in range(s):
        for j in range(s):
            for a in range(u):
                for b in range(u):
                    nested = ((i * s + j) * u * u + (a * u + b)) * c
                    direct = ((i * u + a) * big + (j * u + b)) * c
                    perm[direct:direct + c] = np.arange(nested, nested + c)
    return perm


def phase_split_permutation(s_in, upsample, channels):
    """Inverse of `phase_merge_permutation`: converts the *direct* DCR order
    for depth_to_space(s_in * upsample) into the *nested* order (outer
    s_in-phase groups of inner upsample-phase groups), so the outer level
    can be materialized with one depth_to_space(s_in) while the inner level
    stays in channel space.

    Returns `perm` with  nested = direct[..., perm].
    """
    merge = phase_merge_permutation(s_in, upsample, channels)
    inv = np.empty_like(merge)
    inv[merge] = np.arange(merge.size)
    return inv


def tile_phase(vec, scale):
    """Tile a per-channel vector (bias, PReLU alpha) across s^2 phases in
    DCR order: out[(p)*C + c] = vec[c]."""
    return np.tile(np.asarray(vec), int(scale) ** 2)
