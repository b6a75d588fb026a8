"""Device mesh + sharding helpers.

No reference counterpart — the reference is strictly single-process,
single-device (SURVEY.md §2: no tf.distribute anywhere). This module is the
TPU-native scaling layer: a 1-D (or N-D) `jax.sharding.Mesh` over the slice,
NamedShardings for batch-sharded data and replicated state, and multi-host
initialization. Training parallelism is expressed as jit shardings — XLA's
SPMD partitioner inserts the psum gradient all-reduce over ICI (no NCCL-style
hand-written collectives).
"""

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(axis_sizes: Optional[dict] = None, devices=None) -> Mesh:
    """Build a mesh over all (or given) devices.

    Default: 1-D data-parallel mesh `{"data": n_devices}`. Pass e.g.
    `{"data": 4, "spatial": 2}` for a 2-D mesh (batch × spatial sharding).
    A -1 entry absorbs the remaining devices.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {DATA_AXIS: devices.size}
    names = list(axis_sizes)
    sizes = list(axis_sizes.values())
    n_fixed = int(np.prod([s for s in sizes if s != -1]))
    sizes = [devices.size // n_fixed if s == -1 else s for s in sizes]
    if int(np.prod(sizes)) != devices.size:
        raise ValueError(f"mesh {dict(zip(names, sizes))} does not cover "
                         f"{devices.size} devices")
    return Mesh(devices.reshape(sizes), names)


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Batch-dimension sharding for (B, H, W, C) inputs."""
    return NamedSharding(mesh, P(axis))

def spatial_sharding(mesh: Mesh, axis: str = SPATIAL_AXIS) -> NamedSharding:
    """Height-dimension sharding for one large (H, W, C) image."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = DATA_AXIS):
    """Place a host batch onto the mesh, sharded along its leading dim."""
    return jax.device_put(batch, data_sharding(mesh, axis))


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """jax.distributed initialization for TPU pod slices (multi-host).
    On single-host (or when already initialized) this is a no-op.

    Order matters: the check for an existing client must NOT touch the
    backend (``jax.process_count()`` would initialize it, after which
    ``jax.distributed.initialize`` is rejected) — certified for real by the
    2-process test (tests/parallel/test_multihost_two_process.py)."""
    if coordinator_address is None:
        return
    if jax.distributed.is_initialized():
        return  # already initialized by the runtime
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_batch(mesh: Mesh, local_batch, spec: P = None):
    """Assemble each process's LOCAL batch shard into one GLOBAL array laid
    out over a (possibly multi-host) mesh: the multi-controller companion of
    `shard_batch`. `spec` defaults to batch-dim sharding over the data axis;
    pass `P()` for replicated inputs (e.g. params identical on all hosts).
    Single-process meshes take the plain `device_put` path."""
    spec = P(DATA_AXIS) if spec is None else spec
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding,
                                                  np.asarray(local_batch))


def local_batch_slice(global_batch_size: int) -> slice:
    """The slice of a global batch this host should feed (host-sharded
    input pipelines; pairs with DataPipeline(shard_by_process=True))."""
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
