"""Core primitives: dtype policy, normalization contracts, PRNG discipline."""

from simplesr_tpu.core.dtypes import Policy, default_policy
from simplesr_tpu.core.ranges import (
    normalize_01,
    normalize_11,
    denormalize_11,
    to_01_from_11,
)

__all__ = [
    "Policy",
    "default_policy",
    "normalize_01",
    "normalize_11",
    "denormalize_11",
    "to_01_from_11",
]
