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

Subpixel-tail exception: the pixel-shuffle convs (SubpixelConvBlock) stay
replicated. GSPMD propagates an out-channel kernel sharding into the conv's
activation, and the depth_to_space reshape then re-factors that channel dim
into the tiny r×r spatial dims — a sharding with no efficient transition, so
the SPMD partitioner replicates-then-repartitions the whole HR-resolution
activation every step ("Involuntary full rematerialization" in the XLA log).
The tail kernels are a ~1% slice of the parameters while their activation is
the largest tensor in the network, so replicating them costs ~nothing and
removes the remat entirely (pinned warning-free by
tests/parallel/test_fsdp.py::test_no_involuntary_rematerialization).
"""

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simplesr_tpu.parallel.mesh import DATA_AXIS

# leaves smaller than this stay replicated: sharding a PReLU alpha or a BN
# vector buys nothing and costs a gather
MIN_SHARD_ELEMS = 2 ** 11

# module-name fragments whose params stay replicated regardless of size:
# their out-channel sharding cannot cross the depth_to_space reshape that
# immediately consumes them (see module docstring)
_REPLICATE_PATH_FRAGMENTS = ("SubpixelConvBlock",)


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

    def one(path, leaf):
        arr = jax.numpy.asarray(leaf) if not hasattr(leaf, "shape") else leaf
        if jax.dtypes.issubdtype(arr.dtype, jax.dtypes.extended) or \
                not jax.numpy.issubdtype(arr.dtype, jax.numpy.floating):
            return NamedSharding(mesh, P())  # counters, PRNG keys, ints
        keys = (getattr(k, "key", getattr(k, "name", "")) for k in path)
        if any(frag in str(k) for k in keys
               for frag in _REPLICATE_PATH_FRAGMENTS):
            return NamedSharding(mesh, P())  # pixel-shuffle tail (see above)
        return NamedSharding(mesh, leaf_spec(arr.shape, axis_size, axis))

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_count(tree_shardings) -> int:
    """How many leaves actually got sharded (diagnostics / tests)."""
    return sum(
        any(s is not None for s in ns.spec)
        for ns in jax.tree_util.tree_leaves(
            tree_shardings, is_leaf=lambda x: isinstance(x, NamedSharding)))
