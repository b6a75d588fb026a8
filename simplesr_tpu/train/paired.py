"""Batch→channel paired TRAINING forward for SRResNet (VERDICT r4 #1a).

The inference-side pairing (models/paired.py, ops/pairing.py) expands
trained weights host-side: exact, but one-way — the expanded block-diagonal
kernel is a frozen buffer with no gradient story.

For training the embedding moves INSIDE the differentiable forward: the
parameter tree stays the canonical single-stream SRResNet tree, and each
conv kernel K (kh,kw,Cin,Cout) is scattered onto the (Cin,Cout) block
diagonal of a (kh,kw,w·Cin,w·Cout) zero kernel as part of the jitted step.
Under differentiation the scatter's transpose gathers the w diagonal blocks
of the big kernel's cotangent and sums them — exactly the batch-sum the
unpaired layout computes, since stream j's diagonal block receives precisely
the gradient contribution of batch items j, w+j, 2w+j, …. Paired training
therefore yields the same loss and the same gradients as the standard
layout up to f32 summation order (pinned by tests/train/test_paired_train.py),
while every conv in the step — forward, input-gradient and weight-gradient —
runs at w·C channels: at C=64, w=2 the MXU's 128 lanes fill in both the
contraction and output dimensions (measured trunk rates 53→155 TFLOP/s,
docs/performance.md). The structural-zero MACs cost w×, the rate gain at
w=2 measures ~2.9×, so useful throughput nets ~1.46× — the same trade the
serving path already makes, now applied to the whole training step.

BatchNorm is excluded by construction: packed-layout BN would normalize
each stream over B/w items instead of B — a different function, not a
rewrite. The quality campaigns train BN-free anyway (EDSR's finding;
scripts/quality_campaign.py passes batch_norm=False), so this covers the
production pretrain recipes.

No reference counterpart: the reference trains on cuDNN (GPU), where C=64
implicit-GEMM tiles fine (/root/reference/simple_sr/models/sr_model.py:403
is layout-agnostic). This is TPU MXU geometry.
"""

import math

import jax
import jax.numpy as jnp

from simplesr_tpu.ops.pairing import pack_batch, unpack_batch

__all__ = ["paired_train_apply"]


def _embed(kernel, ways: int):
    """Differentiable block-diagonal embed: (kh,kw,Ci,Co) →
    (kh,kw,w·Ci,w·Co) with `kernel` on the block diagonal. The transpose of
    this scatter sums the w diagonal blocks of the cotangent — the exact
    batch-sum gradient of the underlying kernel."""
    kh, kw, ci, co = kernel.shape
    out = jnp.zeros((kh, kw, ways * ci, ways * co), kernel.dtype)
    for j in range(ways):
        out = out.at[:, :, j * ci:(j + 1) * ci,
                     j * co:(j + 1) * co].set(kernel)
    return out


def _conv(x, p, ways: int, dtype):
    """Paired conv matching flax nn.Conv semantics (promote to `dtype`,
    SAME padding, bias in `dtype`) with the kernel embedded w-fold."""
    k = _embed(jnp.asarray(p["kernel"]), ways).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.tile(jnp.asarray(p["bias"]), ways).astype(dtype)


def _prelu(x, alpha, ways: int):
    a = jnp.tile(jnp.asarray(alpha), ways).astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def _depth_to_space_packed(x, r: int, ways: int):
    """Per-stream TF-DCR depth_to_space on the packed layout:
    [g,H,W,w·(r²C)] → [g,rH,rW,w·C] — one transpose, the same cost class as
    the unpaired shuffle, no unpack round-trip at HR resolution."""
    g, h, w, c = x.shape
    cs = c // ways
    co = cs // (r * r)
    x = x.reshape(g, h, w, ways, r, r, co)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6)  # g, h, i, w, j, stream, co
    return x.reshape(g, h * r, w * r, ways * co)


def paired_train_apply(module, ways: int = 2):
    """Build ``fn(params, x) -> sr`` computing the paired-trunk SRResNet
    forward from the CANONICAL parameter tree (the one `module.init`
    produces): gradients through it equal the standard layout's, so train
    steps, checkpoints, EMA and saved models are byte-compatible with
    unpaired training.

    Requirements: a plain BN-free SRResNet and batch divisible by `ways`.
    """
    from simplesr_tpu.models.srresnet import SRResNet

    if type(module) is not SRResNet:
        raise TypeError(
            f"paired training supports plain SRResNet, got {type(module).__name__}")
    if module.batch_norm:
        raise ValueError(
            "paired training requires batch_norm=False (packed-layout BN "
            "would normalize each stream over batch/ways items — a "
            "different function, not an exact rewrite)")
    ways = int(ways)
    if ways < 2:
        raise ValueError(f"paired ways must be >= 2, got {ways}")
    dtype = module.dtype
    n_blocks = module.num_res_blocks
    n_up = int(math.log2(module.upsample_factor))

    def res_block(block_params, x):
        y = _conv(x, block_params["ConvLayer_0"]["Conv_0"], ways, dtype)
        y = _prelu(y, block_params["PReLU_0"]["alpha"], ways)
        y = _conv(y, block_params["ConvLayer_1"]["Conv_0"], ways, dtype)
        return x + y

    # mirror the module's remat knob: recompute packed block activations in
    # the backward pass instead of holding 2·n_blocks conv outputs
    block = jax.checkpoint(res_block) if module.remat else res_block

    def apply(params, x):
        if x.shape[0] % ways:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by paired ways={ways}")
        x = pack_batch(jnp.asarray(x, dtype), ways)
        x = _conv(x, params["ConvLayer_0"]["Conv_0"], ways, dtype)
        x = x_skip = _prelu(x, params["PReLU_0"]["alpha"], ways)
        for i in range(n_blocks):
            x = block(params[f"ResBlock_{i}"], x)
        x = _conv(x, params["ConvLayer_1"]["Conv_0"], ways, dtype)
        x = x + x_skip
        for i in range(n_up):
            sp = params[f"SubpixelConvBlock_{i}"]
            x = _conv(x, sp["Conv_0"], ways, dtype)
            x = _depth_to_space_packed(x, 2, ways)
            x = _prelu(x, sp["PReLU_0"]["alpha"], ways)
        # final 9×9 conv runs in f32 like the module's tail; unpack at C=3
        # (the cheapest point — 21× less data than unpacking before it)
        x = _conv(x.astype(jnp.float32), params["Conv_0"], ways, jnp.float32)
        return jnp.tanh(unpack_batch(x, ways))

    return apply
