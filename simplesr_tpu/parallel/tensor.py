"""Tensor parallelism: one generator forward split channel-wise across chips.

No reference counterpart (the reference is single-device, SURVEY.md §2).
This is the Megatron pattern mapped onto a conv trunk: inside every residual
block the first conv is *column-parallel* (kernel sharded on its OUT channels
— each chip computes a C/n-channel slice of the activation) and the second is
*row-parallel* (kernel sharded on its IN channels — each chip computes a
partial sum over its slice, combined with one `lax.psum` over ICI). The
per-channel PReLU slope rides the column shard. Each block therefore costs
exactly one all-reduce, and the trunk's FLOPs — where an SR generator spends
almost all its time — split n ways.

Everything is expressed with `shard_map` over a "model" mesh axis whose
in_specs carry the weight shardings, so the *global parameter tree is the
standard SRResNet tree*: checkpoints move freely between single-chip and TP
serving, no weight-space conversion. The head (9×9, 3→C — too few input
channels to split) and the subpixel tail (depth_to_space mixes channels
across the shard boundary) run replicated; they are a small, LR-resolution
slice of the cost. A `data` mesh axis composes orthogonally: batch-shard the
input and the same function runs dp×tp with zero extra code (the psum is over
the model axis only).

Inference-only in the BatchNorm sense (production recipes train SRResNet
with batch_norm=False); the function itself is differentiable — psum /
all_gather have exact transposes — so a TP *training* step works through
`jax.grad` unchanged (pinned by tests/parallel/test_tensor.py).

Numerics: row-parallel partials are accumulated in f32 before the psum
(matching the single-device conv, which accumulates bf16 inputs in f32 and
rounds once), so TP output tracks the single-chip forward to rounding.

RRDB: the dense concatenations make row-parallel awkward (every conv's
input is a running concat of earlier outputs), so the RRDB trunk is
*all-column-parallel*: every dense/fusion conv shards its OUT channels —
each output channel is computed whole on exactly one chip (same reduction
order as single-device → bit-identical math) — and one `lax.all_gather`
re-replicates the activation for the next concat. An all-gather moves half
of what a psum does, and per gathered element a dense conv does
~9·C_in FLOPs, so ICI stays far from the bottleneck. `tp_apply` /
`tp_param_specs` dispatch on the module type.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from simplesr_tpu.models.srresnet import SRResNet
from simplesr_tpu.models.rrdb import RRDBNet
from simplesr_tpu.ops.shuffle import depth_to_space

__all__ = ["MODEL_AXIS", "tp_param_specs", "tp_apply"]

MODEL_AXIS = "model"


def _conv(x, kernel, *, accum=None):
    """NHWC/HWIO SAME conv; `accum` forces the accumulation dtype of the
    result (used to keep row-parallel partials in f32 across the psum)."""
    return lax.conv_general_dilated(
        x, jnp.asarray(kernel, x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum)


def _prelu(x, alpha):
    a = jnp.asarray(alpha, x.dtype)
    return jnp.where(x >= 0, x, a * x)


def tp_param_specs(model, axis: str = MODEL_AXIS):
    """PartitionSpec tree (same structure as `variables["params"]`) for the
    TP forward. SRResNet: per-block conv1 OUT-sharded / conv2 IN-sharded,
    PReLU slope sharded, everything else replicated. RRDB: every
    dense/fusion/post-trunk conv OUT-sharded, head/tail replicated."""
    if isinstance(model, RRDBNet):
        return _rrdb_param_specs(model, axis)
    col = {"Conv_0": {"kernel": P(None, None, None, axis), "bias": P(axis)}}
    row = {"Conv_0": {"kernel": P(None, None, axis, None), "bias": P()}}
    rep_conv = {"Conv_0": {"kernel": P(), "bias": P()}}
    specs = {
        "ConvLayer_0": rep_conv,                      # head 9×9, 3→C
        "PReLU_0": {"alpha": P()},
        "ConvLayer_1": rep_conv,                      # post-trunk C→C
        "Conv_0": {"kernel": P(), "bias": P()},       # final 9×9 → 3
    }
    for i in range(model.num_res_blocks):
        specs[f"ResBlock_{i}"] = {
            "ConvLayer_0": col,
            "PReLU_0": {"alpha": P(axis)},
            "ConvLayer_1": row,
        }
    n_tail = {2: 1, 4: 2, 8: 3}[model.upsample_factor]
    for i in range(n_tail):
        specs[f"SubpixelConvBlock_{i}"] = {
            "Conv_0": {"kernel": P(), "bias": P()},
            "PReLU_0": {"alpha": P()},
        }
    return specs


def tp_apply(model, mesh: Mesh, axis: str = MODEL_AXIS,
             batch_axis: str = None):
    """Build the tensor-parallel forward for a trained SRResNet or RRDBNet.

    Args:
      model: the module the weights were trained with. SRResNet must have
        `batch_norm=False` (production inference recipes) and
        `num_filters` divisible by the model-axis size; RRDBNet
        additionally needs its growth width divisible by it.
      mesh: mesh containing `axis`; if `batch_axis` is given (and present
        in the mesh) the input batch is sharded over it too — dp×tp.

    Returns:
      f(params, x) -> SR image batch, jit-compatible, differentiable.
      `params` is the STANDARD `variables["params"]` tree — shard_map's
      in_specs slice the weight shards per device; no conversion step.
    """
    if isinstance(model, RRDBNet):
        return _rrdb_tp_apply(model, mesh, axis, batch_axis)
    if model.batch_norm:
        raise ValueError("tensor-parallel forward supports batch_norm=False "
                         "models (BatchNorm stats don't shard channel-wise)")
    n = mesh.shape[axis]
    if model.num_filters % n != 0:
        raise ValueError(f"num_filters {model.num_filters} not divisible by "
                         f"mesh axis {axis}={n}")
    dtype = model.dtype
    num_blocks = model.num_res_blocks
    n_tail = {2: 1, 4: 2, 8: 3}[model.upsample_factor]

    def _local(p, x):
        x = jnp.asarray(x, dtype)
        c = p["ConvLayer_0"]["Conv_0"]
        x = _conv(x, c["kernel"]) + jnp.asarray(c["bias"], dtype)
        x = x_skip = _prelu(x, p["PReLU_0"]["alpha"])

        for i in range(num_blocks):
            b = p[f"ResBlock_{i}"]
            c1, c2 = b["ConvLayer_0"]["Conv_0"], b["ConvLayer_1"]["Conv_0"]
            # column-parallel: local kernel slice → C/n-channel activation
            y = _conv(x, c1["kernel"]) + jnp.asarray(c1["bias"], dtype)
            y = _prelu(y, b["PReLU_0"]["alpha"])
            # row-parallel: partial sum over the local IN slice, reduced
            # over ICI in f32, bias added once post-reduction
            y = _conv(y, c2["kernel"], accum=jnp.float32)
            y = lax.psum(y, axis)
            y = jnp.asarray(y, dtype) + jnp.asarray(c2["bias"], dtype)
            x = x + y

        c = p["ConvLayer_1"]["Conv_0"]
        x = _conv(x, c["kernel"]) + jnp.asarray(c["bias"], dtype)
        x = x + x_skip

        for i in range(n_tail):
            t = p[f"SubpixelConvBlock_{i}"]
            x = _conv(x, t["Conv_0"]["kernel"]) \
                + jnp.asarray(t["Conv_0"]["bias"], dtype)
            x = depth_to_space(x, 2)
            x = _prelu(x, t["PReLU_0"]["alpha"])

        c = p["Conv_0"]
        x = jnp.asarray(x, jnp.float32)
        x = _conv(x, c["kernel"]) + jnp.asarray(c["bias"], jnp.float32)
        return jnp.tanh(x)

    x_spec = P(batch_axis) if batch_axis and batch_axis in mesh.shape else P()
    return shard_map(
        _local, mesh=mesh,
        in_specs=(tp_param_specs(model, axis), x_spec),
        out_specs=x_spec,
        check_rep=False,
    )


# --------------------------------------------------------------------- RRDB

def _rrdb_param_specs(model: RRDBNet, axis: str):
    def col():
        return {"kernel": P(None, None, None, axis), "bias": P(axis)}

    def rep():
        return {"kernel": P(), "bias": P()}

    dense = lambda: {f"Conv_{j}": col() for j in range(model.num_convs + 1)}
    specs = {
        "Conv_0": rep(),   # head 3→C: too few input channels to split
        "Conv_1": col(),   # post-trunk C→C
        "Conv_2": rep(),   # tail convs run replicated after depth_to_space
        "Conv_3": rep(),
    }
    for i in range(model.num_rrdb_blocks):
        specs[f"RRDBBlock_{i}"] = {
            f"DenseBlock_{d}": dense()
            for d in range(model.num_dense_blocks)
        }
    for i in range({2: 1, 4: 2, 8: 3}[model.upsample_factor]):
        specs[f"SubpixelConvBlock_{i}"] = {"Conv_0": rep()}
    return specs


def _rrdb_tp_apply(model: RRDBNet, mesh: Mesh, axis: str, batch_axis):
    """All-column-parallel RRDB forward (module reference: models/rrdb.py —
    reference topology /root/reference/simple_sr/utils/models/model_builder.py:42-96).

    Every dense conv computes a growth/n OUT-channel slice from the fully
    replicated running concat (each output channel whole on one chip — the
    exact single-device reduction), then `all_gather` re-replicates it for
    the next concatenation; the fusion and post-trunk convs shard the same
    way. Residual adds, LeakyReLU, global skips and the subpixel tail run
    replicated — identical math to the sequential forward.
    """
    n = mesh.shape[axis]
    growth = model.growth_channels or model.num_filters // 2
    if model.num_filters % n != 0:
        raise ValueError(f"num_filters {model.num_filters} not divisible by "
                         f"mesh axis {axis}={n}")
    if growth % n != 0:
        raise ValueError(f"RRDB growth width {growth} not divisible by "
                         f"mesh axis {axis}={n}")
    dtype = model.dtype
    rs = model.residual_scaling
    num_blocks = model.num_rrdb_blocks
    num_dense = model.num_dense_blocks
    num_convs = model.num_convs
    n_tail = {2: 1, 4: 2, 8: 3}[model.upsample_factor]

    def _col_conv(x, p):
        """Column-parallel conv: local OUT slice, re-replicated over ICI
        (tiled all_gather concatenates in shard order = channel order)."""
        y = _conv(x, p["kernel"]) + jnp.asarray(p["bias"], x.dtype)
        return y

    def _gather(y):
        return lax.all_gather(y, axis, axis=-1, tiled=True)

    def _dense_block(x, p):
        cat = x
        for j in range(num_convs):
            y = _col_conv(cat, p[f"Conv_{j}"])
            y = jax.nn.leaky_relu(y, 0.2)  # elementwise — commutes with gather
            cat = jnp.concatenate([cat, _gather(y)], axis=-1)
        return _gather(_col_conv(cat, p[f"Conv_{num_convs}"]))

    def _local(p, x):
        x = jnp.asarray(x, dtype)
        c = p["Conv_0"]
        x = x_skip = _conv(x, c["kernel"]) + jnp.asarray(c["bias"], dtype)

        trunk = x
        for i in range(num_blocks):
            bp = p[f"RRDBBlock_{i}"]
            for d in range(num_dense):
                trunk = trunk + rs * _dense_block(trunk, bp[f"DenseBlock_{d}"])
        trunk = x_skip + rs * trunk
        trunk = _gather(_col_conv(trunk, p["Conv_1"]))
        x = x_skip + trunk

        for i in range(n_tail):
            t = p[f"SubpixelConvBlock_{i}"]["Conv_0"]
            x = _conv(x, t["kernel"]) + jnp.asarray(t["bias"], dtype)
            x = depth_to_space(x, 2)
            x = jax.nn.leaky_relu(x, 0.2)

        c = p["Conv_2"]
        x = _conv(x, c["kernel"]) + jnp.asarray(c["bias"], dtype)
        x = jax.nn.leaky_relu(x, 0.2)
        c = p["Conv_3"]
        x = jnp.asarray(x, jnp.float32)
        x = _conv(x, c["kernel"]) + jnp.asarray(c["bias"], jnp.float32)
        return jnp.tanh(x)

    x_spec = P(batch_axis) if batch_axis and batch_axis in mesh.shape else P()
    return shard_map(
        _local, mesh=mesh,
        in_specs=(_rrdb_param_specs(model, axis), x_spec),
        out_specs=x_spec,
        check_rep=False,
    )
