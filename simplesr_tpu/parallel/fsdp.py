"""FSDP / ZeRO-3 style state sharding, expressed purely as GSPMD shardings.

No reference counterpart (the reference is single-device, SURVEY.md §2).
`general.fsdp: true` (or `SRModel(mesh=..., fsdp=True)`) shards every large
parameter, optimizer-state and EMA leaf across the data axis instead of
replicating it: each chip holds 1/N of the weights and Adam moments, XLA's
SPMD partitioner inserts the all-gather at each use site and keeps the
gradient reduce + optimizer update sharded (reduce-scatter semantics) — the
canonical JAX FSDP recipe, zero hand-written collectives.

For SimpleSR-sized generators (1.5–17 M params) this is about *capability*
and optimizer-state headroom, not necessity; the sharding rule is the
standard one that scales to models that don't fit on a chip: shard the
largest axis divisible by the mesh axis size, replicate small/indivisible
leaves. Numeric equality with single-device training is pinned by
tests/parallel/test_fsdp.py.

Perf caveat: GSPMD propagates the out-channel kernel sharding into the
activations, and the subpixel (depth_to_space) reshape then forces a
replicate-repartition (XLA logs "Involuntary full rematerialization" —
correct, just not free). For SimpleSR model sizes the win is optimizer-state
memory, not speed; a speed-oriented FSDP would add
`jax.lax.with_sharding_constraint` on the tail activations.
"""

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simplesr_tpu.parallel.mesh import DATA_AXIS

# leaves smaller than this stay replicated: sharding a PReLU alpha or a BN
# vector buys nothing and costs a gather
MIN_SHARD_ELEMS = 2 ** 11


def leaf_spec(shape, axis_size: int, axis: str = DATA_AXIS,
              min_elems: int = MIN_SHARD_ELEMS) -> P:
    """PartitionSpec for one array: shard the largest axis divisible by
    `axis_size` (ties → the last such axis, which for conv kernels is the
    out-channel dim — the natural all-gather granularity); replicate if no
    axis divides or the leaf is small."""
    if int(np.prod(shape, dtype=np.int64)) < min_elems:
        return P()
    best = None
    for d, n in enumerate(shape):
        if n % axis_size == 0 and (best is None or n >= shape[best]):
            best = d
    if best is None:
        return P()
    return P(*([None] * best + [axis]))


def state_shardings(mesh: Mesh, tree: Any, axis: str = DATA_AXIS) -> Any:
    """Per-leaf NamedShardings for an arbitrary state pytree (params,
    optimizer moments, EMA shadows, counters, PRNG keys). Non-float and
    extended-dtype leaves (step counters, PRNG keys) are replicated."""
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def one(leaf):
        arr = jax.numpy.asarray(leaf) if not hasattr(leaf, "shape") else leaf
        if jax.dtypes.issubdtype(arr.dtype, jax.dtypes.extended) or \
                not jax.numpy.issubdtype(arr.dtype, jax.numpy.floating):
            return NamedSharding(mesh, P())  # counters, PRNG keys, ints
        return NamedSharding(mesh, leaf_spec(arr.shape, axis_size, axis))

    return jax.tree_util.tree_map(one, tree)


def shard_count(tree_shardings) -> int:
    """How many leaves actually got sharded (diagnostics / tests)."""
    return sum(
        any(s is not None for s in ns.spec)
        for ns in jax.tree_util.tree_leaves(
            tree_shardings, is_leaf=lambda x: isinstance(x, NamedSharding)))
