"""Spatially-sharded inference: one huge image across many chips.

The reference's answer to large images is host-side overlap tiling
(operations/evaluation.py:256-276). On a TPU slice the same idea maps onto
the mesh: shard the image's height across devices, exchange halo rows with
the ring neighbors over ICI (`lax.ppermute` inside `shard_map`), run the
fully-convolutional generator on each local strip + halos, and crop the
scaled halos off — a seam-free distributed upscale with no host round-trips.
This is the framework's "context-parallel" analogue (SURVEY.md §5).
"""

import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from simplesr_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS

__all__ = ["halo_exchange", "spatial_sharded_apply",
           "spatial_sharded_apply_batched"]


def halo_exchange(x, halo: int, axis_name: str):
    """Append `halo` rows from the ring neighbors to a local (h, W, C) strip.

    Returns (halo + h + halo, W, C); the first/last device's outer halo is
    zero-filled (matches the zero padding of the tiled host path,
    ops/tiling.py)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    # from the previous device: its last `halo` rows
    fwd = [(i, (i + 1) % n) for i in range(n)]
    from_prev = lax.ppermute(x[-halo:], axis_name, fwd)
    # from the next device: its first `halo` rows
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_next = lax.ppermute(x[:halo], axis_name, bwd)
    zeros = jnp.zeros_like(from_prev)
    top = jnp.where(idx == 0, zeros, from_prev)
    bottom = jnp.where(idx == n - 1, zeros, from_next)
    return jnp.concatenate([top, x, bottom], axis=0)


def spatial_sharded_apply(apply_fn, image, mesh: Mesh, scale: int,
                          halo: int = 32, axis: str = SPATIAL_AXIS):
    """SR an (H, W, C) image sharded over `mesh[axis]`.

    Args:
      apply_fn: jittable (1, h, W, C) → (1, s·h, s·W, C) generator forward
        (weights closed over — they are replicated automatically).
      image: (H, W, C); H must be divisible by the axis size.
      mesh: mesh containing `axis`.
      scale: the model's upsample factor.
      halo: LR-pixel halo exchanged per side; inter-device seams are exact
        when it covers the model's receptive field.

    Boundary semantics: the image's OUTER borders are computed with zero rows
    beyond the image at every layer (the first/last device's outer halo is
    zero-filled), exactly like the host overlap-tiling path (ops/tiling.py
    zero-pads before segmentation) — near-identical but not bit-equal to a
    whole-image forward whose SAME padding re-zeroes at each conv.

    Returns: (s·H, s·W, C), sharded over the same axis.
    """
    n = mesh.shape[axis]
    h, w, c = image.shape
    if h % n != 0:
        raise ValueError(f"image height {h} not divisible by mesh axis {n}")

    def _local(img_strip):
        # img_strip: (h/n, W, C) local shard
        strip = halo_exchange(img_strip, halo, axis)
        sr = apply_fn(strip[None])[0]
        return sr[halo * scale:-halo * scale if halo else None]

    out = shard_map(
        _local, mesh=mesh,
        in_specs=P(axis, None, None),
        out_specs=P(axis, None, None),
        check_rep=False,
    )(image)
    return out


def spatial_sharded_apply_batched(apply_fn, images, mesh: Mesh, scale: int,
                                  halo: int = 32, batch_axis: str = DATA_AXIS,
                                  axis: str = SPATIAL_AXIS):
    """SR a BATCH of huge images over a 2-D (batch × spatial) mesh.

    The two parallel axes compose orthogonally: the batch splits over
    `mesh[batch_axis]` (pure SPMD — no collectives) while each image's
    height splits over `mesh[axis]` with halo rows exchanged between the
    spatial ring neighbors over ICI, exactly like `spatial_sharded_apply`.
    This is the serving shape for "many giant images on a slice": e.g. a
    4×2 v5e-8 mesh runs 4 images at once, each across 2 chips.

    Args:
      apply_fn: jittable (N, h, W, C) → (N, s·h, s·W, C) generator forward.
      images: (B, H, W, C); B divisible by the batch axis size, H by the
        spatial axis size.

    Boundary semantics match `spatial_sharded_apply` (outer borders see
    zero rows beyond the image once, like the host tiling path).

    Returns: (B, s·H, s·W, C), sharded over both axes.
    """
    nb, ns = mesh.shape[batch_axis], mesh.shape[axis]
    b, h, w, c = images.shape
    if b % nb != 0:
        raise ValueError(f"batch {b} not divisible by mesh axis {nb}")
    if h % ns != 0:
        raise ValueError(f"image height {h} not divisible by mesh axis {ns}")

    def _local(imgs):
        # imgs: (B/nb, H/ns, W, C) local shard — halo rows on axis 1
        n = lax.axis_size(axis)
        idx = lax.axis_index(axis)
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_prev = lax.ppermute(imgs[:, -halo:], axis, fwd)
        from_next = lax.ppermute(imgs[:, :halo], axis, bwd)
        top = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
        bottom = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
        strips = jnp.concatenate([top, imgs, bottom], axis=1)
        sr = apply_fn(strips)
        return sr[:, halo * scale:-halo * scale if halo else None]

    return shard_map(
        _local, mesh=mesh,
        in_specs=P(batch_axis, axis, None, None),
        out_specs=P(batch_axis, axis, None, None),
        check_rep=False,
    )(images)
