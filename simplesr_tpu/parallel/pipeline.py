"""Pipeline parallelism: the residual trunk staged across chips.

No reference counterpart (single-device reference, SURVEY.md §2). The deep
SR trunks (SRResNet-16/24, RRDB-23) are a chain of identical residual
blocks — the textbook pipeline shape. This module splits the chain into
`n_stages` contiguous segments, one per device along a "stage" mesh axis,
and streams microbatches through the ring: at every step each stage passes
its previous activation to the next stage over ICI (`lax.ppermute`) and
computes its block segment on the newly received one. A batch of B images
crosses the trunk in `M + n_stages - 1` steps (M = microbatch count) — the
standard GPipe fill-and-drain schedule expressed as one `lax.scan` inside
`shard_map`, no hand-written buffering.

The global parameter tree is the STANDARD SRResNet tree — the stage split
happens by stacking the (homogeneous) block parameters on a leading axis
that shard_map shards, so checkpoints need no conversion. Head (9×9 conv +
PReLU), post-trunk conv, global skip and the subpixel tail run replicated
outside the pipelined region: they are a small fraction of the cost, and
every stage would otherwise idle during fill/drain anyway.

Per-microbatch math is identical to the sequential forward (no reductions
are introduced), so the pipeline output is bit-for-bit the single-device
forward up to XLA scheduling; `jax.grad` differentiates straight through
the scan + ppermute (pinned by tests/parallel/test_pipeline_parallel.py).

When to use: capability/memory — a trunk too deep for one chip's HBM, or
pipelining as the second axis of a dp×pp mesh. For SimpleSR-sized models
data/spatial sharding is faster (no bubble); this module completes the
parallelism surface the same way fsdp.py does.
"""

import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from simplesr_tpu.models.srresnet import SRResNet
from simplesr_tpu.parallel.tensor import _conv, _prelu
from simplesr_tpu.ops.shuffle import depth_to_space

__all__ = ["STAGE_AXIS", "stack_block_params", "pipeline_apply"]

STAGE_AXIS = "stage"


def stack_block_params(model: SRResNet, params):
    """Stack the trunk's per-block parameters on a leading block axis:
    (k1, b1, alpha, k2, b2), each with shape (num_res_blocks, ...). The
    blocks are homogeneous (same C→C shapes), which is what makes both the
    stage sharding and the per-stage `lax.scan` possible."""
    def leaf(path):
        return jnp.stack([
            params[f"ResBlock_{i}"][path[0]][path[1]][path[2]]
            if len(path) == 3 else params[f"ResBlock_{i}"][path[0]][path[1]]
            for i in range(model.num_res_blocks)])
    return (leaf(("ConvLayer_0", "Conv_0", "kernel")),
            leaf(("ConvLayer_0", "Conv_0", "bias")),
            leaf(("PReLU_0", "alpha")),
            leaf(("ConvLayer_1", "Conv_0", "kernel")),
            leaf(("ConvLayer_1", "Conv_0", "bias")))


def pipeline_apply(model: SRResNet, mesh: Mesh, num_microbatches: int,
                   axis: str = STAGE_AXIS, batch_axis: str = None):
    """Build the pipeline-parallel forward for a trained SRResNet.

    Args:
      model: the SRResNet the weights were trained with (batch_norm=False —
        BN stats don't commute with microbatching).
      mesh: mesh containing `axis`; `model.num_res_blocks` must divide
        evenly into the axis size.
      num_microbatches: microbatches per call; the batch must divide by it.
        More microbatches → smaller pipeline bubble (n_stages-1 of
        M+n_stages-1 steps), larger per-step launch overhead.
      batch_axis: optional mesh axis to shard the microbatch interior over
        (dp×pp composition — each data shard streams its own microbatches
        through the same stage ring). Ignored if absent from the mesh.

    Returns:
      f(params, x) -> SR batch; `params` is the standard tree.
    """
    if not isinstance(model, SRResNet):
        raise ValueError("pipeline forward supports SRResNet trunks, got "
                         f"{type(model).__name__}")
    if model.batch_norm:
        raise ValueError("pipeline forward supports batch_norm=False models")
    n_stages = mesh.shape[axis]
    if model.num_res_blocks % n_stages != 0:
        raise ValueError(f"num_res_blocks {model.num_res_blocks} not "
                         f"divisible by mesh axis {axis}={n_stages}")
    dtype = model.dtype
    m = num_microbatches
    n_tail = {2: 1, 4: 2, 8: 3}[model.upsample_factor]

    def _block(x, bp):
        k1, b1, al, k2, b2 = bp
        y = _conv(x, k1) + jnp.asarray(b1, x.dtype)
        y = _prelu(y, al)
        y = _conv(y, k2) + jnp.asarray(b2, x.dtype)
        return x + y, None

    def _stage(stacked, x_mb):
        # stacked leaves arrive (1, blocks_per_stage, ...) — my stage's slice
        mine = tuple(s[0] for s in stacked)
        idx = lax.axis_index(axis)
        fwd = [(i, i + 1) for i in range(n_stages - 1)]
        steps = m + n_stages - 1

        def step(carry, t):
            recv = lax.ppermute(carry, axis, fwd)
            feed = lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            x_in = jnp.where(idx == 0, feed, recv)
            y, _ = lax.scan(_block, x_in, mine)
            return y, y

        init = jnp.zeros(x_mb.shape[1:], x_mb.dtype)
        _, ys = lax.scan(step, init, jnp.arange(steps))
        # (1, steps, mb, h, w, c): stage-major so the caller can slice the
        # last stage's drain window out of the stage-sharded result
        return ys[None]

    b_ax = batch_axis if (batch_axis and batch_axis in mesh.shape) else None
    run = shard_map(
        _stage, mesh=mesh,
        # x_mb is (microbatch, batch, h, w, c): microbatch dim replicated
        # (every stage sees the whole schedule), interior batch dim sharded
        # over the data axis when composing dp×pp
        in_specs=((P(axis),) * 5, P(None, b_ax)),
        out_specs=P(axis, None, b_ax),
        check_rep=False,
    )

    def f(params, x):
        b, h, w, _ = x.shape
        if b % m != 0:
            raise ValueError(f"batch {b} not divisible by microbatches {m}")
        if b_ax and (b // m) % mesh.shape[b_ax] != 0:
            raise ValueError(
                f"microbatch size {b // m} (batch {b} / {m} microbatches) "
                f"not divisible by the '{b_ax}' mesh axis "
                f"({mesh.shape[b_ax]}) — dp×pp shards the microbatch "
                "interior over the data axis")
        x = jnp.asarray(x, dtype)
        c = params["ConvLayer_0"]["Conv_0"]
        x = _conv(x, c["kernel"]) + jnp.asarray(c["bias"], dtype)
        x = x_skip = _prelu(x, params["PReLU_0"]["alpha"])

        stacked = stack_block_params(model, params)
        stacked = tuple(
            s.reshape((n_stages, model.num_res_blocks // n_stages) + s.shape[1:])
            for s in stacked)
        mb = x.reshape((m, b // m) + x.shape[1:])
        ys = run(stacked, mb)                     # (n_stages, steps, mb, ...)
        x = ys[-1, n_stages - 1:]                 # last stage's drain window
        x = x.reshape((b,) + x.shape[2:])

        c = params["ConvLayer_1"]["Conv_0"]
        x = _conv(x, c["kernel"]) + jnp.asarray(c["bias"], dtype)
        x = x + x_skip

        for i in range(n_tail):
            t = params[f"SubpixelConvBlock_{i}"]
            x = _conv(x, t["Conv_0"]["kernel"]) \
                + jnp.asarray(t["Conv_0"]["bias"], dtype)
            x = depth_to_space(x, 2)
            x = _prelu(x, t["PReLU_0"]["alpha"])

        c = params["Conv_0"]
        x = jnp.asarray(x, jnp.float32)
        x = _conv(x, c["kernel"]) + jnp.asarray(c["bias"], jnp.float32)
        return jnp.tanh(x)

    return f
