"""Shared network building blocks (flax.linen).

Re-designs of the reference's Keras graph builders
(/root/reference/simple_sr/utils/models/model_builder.py:275-365) as linen
modules with an explicit bf16-compute / f32-param dtype split. Convs run in
NHWC — the layout XLA:TPU prefers for convolutions feeding the MXU.
"""

from typing import Any, Callable, Optional

import jax.numpy as jnp
import flax.linen as nn

# Keras defaults used by the reference builders.
glorot_uniform = nn.initializers.glorot_uniform()


def scaled_he_normal(scale: float = 0.2):
    """he_normal with its variance scale overridden — the reference's
    RRDB/discriminator initializer (model_builder.py:60-61,155-157 mutates
    `he_normal().scale = 0.2`)."""
    return nn.initializers.variance_scaling(scale, "fan_in", "truncated_normal")


class PReLU(nn.Module):
    """Per-channel PReLU, Keras semantics: PReLU(shared_axes=[1,2]) — one
    learnable slope per channel, initialized to zero (model_builder.py:118)."""

    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],), self.param_dtype)
        alpha = jnp.asarray(alpha, x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class ConvLayer(nn.Module):
    """Conv2D (+ optional BatchNorm) — reference _build_conv_layer
    (model_builder.py:285-293). BatchNorm runs in f32 regardless of the
    compute dtype; Keras momentum maps 1:1 to flax momentum."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    batch_norm: bool = False
    momentum: float = 0.8
    kernel_init: Callable = glorot_uniform
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.momentum,
                epsilon=1e-3,  # Keras BatchNormalization default
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
                axis_name=self.bn_axis_name,
            )(x)
        return x


class SubpixelConvBlock(nn.Module):
    """Conv to C·r² channels → depth_to_space(r) → optional PReLU — reference
    _subpixel_conv_block (model_builder.py:275-282). The conv output channel
    count follows the *input* channel count like the reference."""

    upsample_factor: int = 2
    activation: bool = True  # PReLU when True (SRResNet); caller adds LReLU otherwise (ESRGAN)
    kernel_init: Callable = glorot_uniform
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from simplesr_tpu.ops.shuffle import depth_to_space

        c = x.shape[-1]
        r = self.upsample_factor
        x = nn.Conv(
            c * r * r, (3, 3), padding="SAME", kernel_init=self.kernel_init,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        x = depth_to_space(x, r)
        if self.activation:
            x = PReLU(param_dtype=self.param_dtype)(x)
        return x
