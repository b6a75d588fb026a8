"""Pallas TPU kernels for bandwidth-bound hot ops."""

from simplesr_tpu.ops.pallas.tiling_kernel import (
    extract_overlapping_patches_pallas,
)

__all__ = ["extract_overlapping_patches_pallas"]
