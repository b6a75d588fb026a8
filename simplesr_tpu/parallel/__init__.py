"""Parallelism layer: mesh construction, data-parallel training shardings,
FSDP/ZeRO-3 state sharding, spatially-sharded (halo-exchange) inference,
tensor-parallel (Megatron channel-split) and pipeline-parallel (GPipe
staged-trunk) forwards, multi-host init."""

from simplesr_tpu.parallel.mesh import (
    make_mesh, data_sharding, spatial_sharding, replicated, shard_batch,
    initialize_multihost, local_batch_slice, global_batch, DATA_AXIS,
    SPATIAL_AXIS,
)
from simplesr_tpu.parallel.spatial import (halo_exchange, spatial_sharded_apply,
                                            spatial_sharded_apply_batched)
from simplesr_tpu.parallel.fsdp import leaf_spec, state_shardings, shard_count
from simplesr_tpu.parallel.tensor import tp_apply, tp_param_specs, MODEL_AXIS
from simplesr_tpu.parallel.pipeline import (pipeline_apply, stack_block_params,
                                            STAGE_AXIS)

__all__ = [
    "make_mesh", "data_sharding", "spatial_sharding", "replicated",
    "shard_batch", "initialize_multihost", "local_batch_slice",
    "global_batch",
    "DATA_AXIS", "SPATIAL_AXIS", "halo_exchange", "spatial_sharded_apply",
    "spatial_sharded_apply_batched",
    "leaf_spec", "state_shardings", "shard_count",
    "tp_apply", "tp_param_specs", "MODEL_AXIS",
    "pipeline_apply", "stack_block_params", "STAGE_AXIS",
]
