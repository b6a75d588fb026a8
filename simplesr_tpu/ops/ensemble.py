"""Geometric self-ensemble (×8 test-time augmentation) for SR inference.

A capability beyond the reference (bw0248/SimpleSR has no TTA): run the
model on all eight dihedral variants of the input (4 rotations × optional
horizontal flip), invert each output's transform, and average. For SR
networks this is the classic "self-ensemble" of Timofte et al. (EDSR/NTIRE
practice) — typically worth ~0.1–0.3 dB PSNR at 8× the inference FLOPs.

TPU-first shape handling: the eight variants are NOT run one-by-one.
Rotations by 90°/270° swap H and W, so the variants fall into exactly two
shape groups — {k: rot even} at (H, W) and {k: rot odd} at (W, H). Each
group is stacked along the batch axis and run as ONE forward (batch 4×B),
keeping the MXU batch-filled and compiling at most two shapes (one for
square inputs). Averaging is done in f32 regardless of the model's compute
dtype.

The transforms are pure `jnp.rot90`/`flip` — relayouts, no FLOPs — and
`dihedral_inverse(dihedral_transform(x, k), k) == x` holds bit-exactly
(tests/ops/test_ensemble.py).
"""

import jax
import jax.numpy as jnp

#: number of elements in the dihedral group D4 (the ensemble size)
NUM_TRANSFORMS = 8


def dihedral_transform(x, k):
    """Apply dihedral-group element `k` ∈ [0, 8) to NHWC (or HWC) images.

    k % 4 counts counter-clockwise 90° rotations; k >= 4 additionally
    flips horizontally (axis W) BEFORE rotating. k=0 is the identity.
    """
    if not 0 <= k < NUM_TRANSFORMS:
        raise ValueError(f"k must be in [0, {NUM_TRANSFORMS}), got {k}")
    if k >= 4:
        x = jnp.flip(x, axis=-2)
    return jnp.rot90(x, k % 4, axes=(-3, -2))


def dihedral_inverse(x, k):
    """Invert `dihedral_transform(·, k)` (exact, bit-for-bit)."""
    if not 0 <= k < NUM_TRANSFORMS:
        raise ValueError(f"k must be in [0, {NUM_TRANSFORMS}), got {k}")
    x = jnp.rot90(x, -(k % 4), axes=(-3, -2))
    if k >= 4:
        x = jnp.flip(x, axis=-2)
    return x


def _group_batched(predict, x, ks):
    """Run `predict` once on the batch-stacked transforms `ks` of x (NHWC);
    return the per-k outputs with their transforms inverted, shape
    (len(ks), N, H*s, W*s, C). All ks in one group share an input shape."""
    b = x.shape[0]
    stacked = jnp.concatenate([dihedral_transform(x, k) for k in ks], axis=0)
    out = predict(stacked)
    return [dihedral_inverse(out[i * b:(i + 1) * b], k)
            for i, k in enumerate(ks)]


def self_ensemble(predict, x, transforms=None):
    """SR `x` (NHWC) through `predict` under geometric self-ensemble.

    `predict(nhwc) -> nhwc` must accept any batch size (jitted callables
    recompile per shape — at most two shapes are used). `transforms`
    optionally restricts the ensemble to a subset of [0, 8) (e.g. (0, 4)
    for a cheap flip-only ×2 ensemble). Returns the f32 mean of the
    inverse-transformed outputs.
    """
    ks = tuple(range(NUM_TRANSFORMS)) if transforms is None else tuple(transforms)
    if len(ks) != len(set(ks)):
        raise ValueError(f"duplicate transforms: {ks}")
    even = [k for k in ks if k % 2 == 0]  # keep (H, W)
    odd = [k for k in ks if k % 2 == 1]   # rotated to (W, H)
    outs = []
    for group in (even, odd):
        if group:
            outs.extend(_group_batched(predict, x, group))
    acc = jnp.zeros_like(outs[0], dtype=jnp.float32)
    for o in outs:
        acc = acc + o.astype(jnp.float32)
    return acc / len(outs)


def ensemble_predictor(predict, transforms=None):
    """Wrap `fn(nhwc) -> nhwc` into its self-ensembled version.

    The returned callable has the same signature and output range as
    `predict`, so it drops into every downstream surface (tiled_apply,
    evaluation, the serving engine). Not jitted here — `predict` is
    typically already jitted and the wrapper adds only relayouts around
    two calls of it.
    """
    def _ensembled(x):
        return self_ensemble(predict, x, transforms=transforms)
    return _ensembled
