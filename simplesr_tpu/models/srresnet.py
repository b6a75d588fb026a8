"""SRResNet generator (SRGAN paper) as a flax module.

Topology parity with reference model_builder.build_resnet
(/root/reference/simple_sr/utils/models/model_builder.py:99-134):
9×9 conv (64f) → PReLU [skip tap] → N residual blocks (conv3[+BN] → PReLU →
conv3[+BN] → add) → conv3[+BN] → global skip add → log2(scale) × subpixel
blocks (conv→depth_to_space×2→PReLU) → 9×9 conv to 3ch, tanh.

Input contract: LR in [0, 1]; output in [-1, 1] (tanh), matching the
reference's asymmetric normalization (data_pipeline.py:318-330).

TPU notes: convs execute in bf16 (policy), params/BN/tanh in f32; all shapes
static under jit. Upsampling stays in channel space until depth_to_space so
the heavy convs run at LR resolution.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from simplesr_tpu.models.blocks import ConvLayer, PReLU, SubpixelConvBlock

_ALLOWED_SCALES = (2, 4, 8)


class ResBlock(nn.Module):
    """SRGAN residual block — reference _res_block (model_builder.py:309)."""

    num_filters: int = 64
    momentum: float = 0.8
    batch_norm: bool = True
    dtype: Any = jnp.bfloat16
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvLayer(self.num_filters, 3, batch_norm=self.batch_norm,
                      momentum=self.momentum, dtype=self.dtype,
                      bn_axis_name=self.bn_axis_name)(x, train)
        y = PReLU()(y)
        y = ConvLayer(self.num_filters, 3, batch_norm=self.batch_norm,
                      momentum=self.momentum, dtype=self.dtype,
                      bn_axis_name=self.bn_axis_name)(y, train)
        return x + y


class SRResNet(nn.Module):
    """SRResNet ×{2,4,8} generator."""

    upsample_factor: int = 4
    num_filters: int = 64
    num_res_blocks: int = 16
    momentum: float = 0.8
    batch_norm: bool = True
    dtype: Any = jnp.bfloat16
    bn_axis_name: Any = None  # set to the data mesh axis for cross-replica BN
    # rematerialize each residual block under grad (jax.checkpoint): the
    # backward pass recomputes block activations instead of holding all
    # 2·num_res_blocks conv outputs in HBM — trades ~1 extra trunk forward
    # for O(num_res_blocks)→O(1) activation memory, buying batch/depth
    # headroom on-chip. Exactness + tree-parity pinned by
    # tests/models/test_remat.py; memory numbers by scripts/remat_study.py.
    remat: bool = False

    def __post_init__(self):
        super().__post_init__()
        if self.upsample_factor not in _ALLOWED_SCALES:
            raise ValueError(
                "upsample factor not supported - please choose either 2, 4 or 8")

    @nn.compact
    def __call__(self, x, train: bool = False):
        return self._tail(self._features(x, train), train)

    def _trunk_width(self) -> int:
        """Channel width the trunk convs run at. The batch→channel paired
        inference variant (models/paired.py) widens this `ways`-fold while
        keeping the same parameter tree structure."""
        return self.num_filters

    def _features(self, x, train: bool):
        """Head + residual trunk + global skip — shared with the polyphase
        inference variant (models/polyphase.py), which must generate the
        identical parameter tree for this part."""
        width = self._trunk_width()
        x = jnp.asarray(x, self.dtype)
        x = ConvLayer(width, 9, dtype=self.dtype)(x, train)
        x = x_skip = PReLU()(x)

        # Explicit names pin the parameter tree to "ResBlock_i/..." in both
        # modes (nn.remat's auto-name would be "CheckpointResBlock_i"), so
        # checkpoints and saved models move freely between remat settings.
        # `train` is a Python bool branching inside (BatchNorm), hence
        # static: argnums count (self, x, train).
        block_cls = nn.remat(ResBlock, static_argnums=(2,)) if self.remat \
            else ResBlock
        for i in range(self.num_res_blocks):
            x = block_cls(width, self.momentum, self.batch_norm,
                          dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                          name=f"ResBlock_{i}")(x, train)

        x = ConvLayer(width, 3, batch_norm=self.batch_norm,
                      momentum=self.momentum, dtype=self.dtype,
                      bn_axis_name=self.bn_axis_name)(x, train)
        return x + x_skip

    def _tail(self, x, train: bool):
        scale = self.upsample_factor
        while scale > 1:
            x = SubpixelConvBlock(2, activation=True, dtype=self.dtype)(x)
            scale //= 2

        x = nn.Conv(3, (9, 9), padding="SAME", dtype=jnp.float32)(
            jnp.asarray(x, jnp.float32))
        return jnp.tanh(x)
