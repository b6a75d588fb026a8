"""Batched random cropping — gather-based, RNG-keyed, jittable.

Reference equivalents: image_transforms.crop_naive
(/root/reference/simple_sr/utils/image/image_transforms.py:50) which loops
`tf.image.random_crop` on host, and the experimental diversity-sampled
crop_divers (:83) which rejection-samples in eager Python.

TPU-native redesign: all crops for an image (or a whole batch of images) are
taken in one jitted call. Diversity cropping becomes a *bounded* oversample →
score → top-k mask-select so there is no data-dependent control flow under
jit (SURVEY.md §7 hard part #6).
"""

import jax
import jax.numpy as jnp

__all__ = ["random_crops", "diverse_crops", "crop_at"]


def crop_at(img, top, left, patch_h, patch_w):
    """Static-size dynamic-position crop of an HWC image."""
    return jax.lax.dynamic_slice(
        img, (top, left, 0), (patch_h, patch_w, img.shape[-1])
    )


def random_crops(key, img, num_crops, patch_size):
    """Crop `num_crops` random (ph, pw) patches from one HWC image.

    Equivalent of reference crop_naive (image_transforms.py:50), executed as
    one vmapped gather instead of a host loop.

    Returns: (num_crops, ph, pw, C).
    """
    ph, pw = int(patch_size[0]), int(patch_size[1])
    h, w = img.shape[0], img.shape[1]
    if h < ph or w < pw:
        raise ValueError(f"patch {ph}x{pw} larger than image {h}x{w}")
    kt, kl = jax.random.split(key)
    tops = jax.random.randint(kt, (num_crops,), 0, h - ph + 1)
    lefts = jax.random.randint(kl, (num_crops,), 0, w - pw + 1)
    return jax.vmap(lambda t, l: crop_at(img, t, l, ph, pw))(tops, lefts)


def batch_random_crops(key, imgs, num_crops, patch_size):
    """Random crops for a batch: (B,H,W,C) → (B*num_crops, ph, pw, C)."""
    keys = jax.random.split(key, imgs.shape[0])
    crops = jax.vmap(lambda k, im: random_crops(k, im, num_crops, patch_size))(keys, imgs)
    return crops.reshape((-1,) + crops.shape[2:])


def diverse_crops(key, img, num_crops, patch_size, min_variation_patch,
                  min_variation_batch=0.0, oversample=8):
    """Diversity-aware cropping, reference crop_divers re-designed for XLA.

    Instead of rejection-sampling until thresholds pass (data-dependent
    loops, image_transforms.py:83-148), sample ``num_crops * oversample``
    candidates in one shot, score each by per-patch std-dev, and mask-select:
    candidates whose std exceeds ``min_variation_patch`` win (earliest
    first, matching the reference's first-accepted-wins order); if fewer
    than ``num_crops`` pass, the remaining slots fall back to the highest-std
    rejects (the reference's "maxed out on trys — taking it anyway" path).
    If the chosen set's diversity (std of patch means) is below
    ``min_variation_batch``, selection re-ranks by distance from the mean of
    means to maximize batch diversity — a deterministic, bounded equivalent
    of the reference's batch-level retry loop.

    Returns: (num_crops, ph, pw, C).
    """
    k = int(num_crops) * int(oversample)
    cands = random_crops(key, img, k, patch_size)  # (K, ph, pw, C)
    stds = jnp.std(cands.reshape(k, -1), axis=1)
    passes = stds > min_variation_patch
    # Order: passing candidates by original index, then rejects by std desc.
    order_pass = jnp.where(passes, jnp.arange(k), k + jnp.argsort(-stds))
    first_pick = jnp.argsort(order_pass)[:num_crops]

    means = jnp.mean(cands.reshape(k, -1), axis=1)
    batch_var = jnp.std(means[first_pick])
    # Diversity re-rank (used only if the first pick is too uniform): take
    # the passing candidates with the LOWEST and HIGHEST patch means — both
    # tails, which maximizes the std of the selected means. (Maximizing
    # |mean − center| instead can select one tight cluster from a single
    # tail and *fail* the diversity bar — caught by the numeric comparison
    # against the reference's retry loop, tests/ops/test_crop_divers_parity.py.)
    # Rejects rank as if they sat at the median so both tails avoid them.
    rank_key = jnp.where(passes, means, jnp.median(means))
    by_mean = jnp.argsort(rank_key)
    n_lo = num_crops - num_crops // 2
    diverse_pick = jnp.concatenate([by_mean[:n_lo], by_mean[k - num_crops // 2:]])
    pick = jnp.where(batch_var >= min_variation_batch, first_pick, diverse_pick)
    return cands[pick]
