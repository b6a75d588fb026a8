"""RRDB (ESRGAN) generator as a flax module.

Topology parity with reference model_builder.build_enhanced_resnet
(/root/reference/simple_sr/utils/models/model_builder.py:42-96):
conv3 [skip tap] → N RRDB blocks → conv3 → global ×0.2-scaled skip add →
log2(scale) × (subpixel → LeakyReLU 0.2) → conv3 + LeakyReLU → conv3 tanh.

An RRDB block (:344-351) chains `num_dense_blocks` dense blocks, each added
residually after ×residual_scaling. A dense block (:328-341) is `num_convs`
convs at num_filters//2 with DenseNet-style concatenation of all previous
activations + LeakyReLU 0.2, closed by a conv back to num_filters. No
BatchNorm anywhere (paper-faithful). Init: he_normal with scale 0.2 (:60-61).

Note the reference applies ONE global ×0.2 trunk skip after all RRDB blocks
(_build_rrdb_blocks:363-364) rather than the paper's per-block outer skip —
that scaled skip feeds the post-trunk conv, and a second, unscaled skip
from the head conv wraps it (build_enhanced_resnet:79). Both are matched
here; bit-level parity with the reference builder is pinned by
tests/eval/test_import_keras.py.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from simplesr_tpu.models.blocks import scaled_he_normal, SubpixelConvBlock

_ALLOWED_SCALES = (2, 4, 8)


class DenseBlock(nn.Module):
    num_convs: int = 4
    num_filters: int = 64
    kernel_size: int = 3
    dtype: Any = jnp.bfloat16
    # dense-conv output width ("growth"); None = num_filters//2, the
    # reference topology (model_builder.py:328-341). The MXU lane dimension
    # is the conv OUTPUT channel count, so growth < 128 under-fills the
    # 128-wide systolic array — growth_channels=128 is the lane-filled
    # variant (docs/performance.md roofline).
    growth_channels: Any = None

    @nn.compact
    def __call__(self, x):
        init = scaled_he_normal(0.2)
        growth = self.growth_channels or self.num_filters // 2
        prev = [x]
        for _ in range(self.num_convs):
            y = nn.Conv(growth,
                        (self.kernel_size, self.kernel_size), padding="SAME",
                        kernel_init=init, dtype=self.dtype)(prev[-1] if len(prev) == 1 else x)
            y = nn.leaky_relu(y, 0.2)
            prev.append(y)
            x = jnp.concatenate(prev, axis=-1)
        return nn.Conv(self.num_filters, (3, 3), padding="SAME",
                       kernel_init=init, dtype=self.dtype)(x)


class RRDBBlock(nn.Module):
    num_dense_blocks: int = 3
    num_convs: int = 4
    num_filters: int = 64
    kernel_size: int = 3
    residual_scaling: float = 0.2
    dtype: Any = jnp.bfloat16
    growth_channels: Any = None

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_dense_blocks):
            block = DenseBlock(self.num_convs, self.num_filters,
                               self.kernel_size, dtype=self.dtype,
                               growth_channels=self.growth_channels)(x)
            x = x + self.residual_scaling * block
        return x


class RRDBNet(nn.Module):
    """ESRGAN Residual-in-Residual Dense Block network ×{2,4,8}."""

    upsample_factor: int = 4
    num_filters: int = 64
    num_rrdb_blocks: int = 16
    num_dense_blocks: int = 3
    num_convs: int = 4
    kernel_size: int = 3
    residual_scaling: float = 0.2
    dtype: Any = jnp.bfloat16
    growth_channels: Any = None  # None = num_filters//2 (reference parity)
    # rematerialize each RRDB block under grad (jax.checkpoint): the dense
    # concatenations make RRDB's activation footprint ~5× a plain resnet's
    # per block, so deep trunks OOM long before the MXU is busy — remat
    # recomputes them in the backward pass instead (tests/models/test_remat.py;
    # scripts/remat_study.py for the measured memory table).
    remat: bool = False

    def __post_init__(self):
        super().__post_init__()
        if self.upsample_factor not in _ALLOWED_SCALES:
            raise ValueError(
                "upsample factor not supported - please choose either 2, 4 or 8")

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BatchNorm in RRDB — signature kept uniform
        return self._tail(self._features(x))

    def _trunk_width(self) -> int:
        """Channel width the trunk runs at — widened `ways`-fold by the
        batch→channel paired inference variant (models/paired.py)."""
        return self.num_filters

    def _trunk_growth(self):
        """Dense-conv growth width the trunk runs at (None = width//2,
        which scales with `_trunk_width` automatically)."""
        return self.growth_channels

    def _features(self, x):
        """Head + RRDB trunk + global scaled skip — shared with the
        polyphase inference variant (models/polyphase.py), which must
        generate the identical parameter tree for this part."""
        init = scaled_he_normal(0.2)
        width = self._trunk_width()
        x = jnp.asarray(x, self.dtype)
        x = x_skip = nn.Conv(width, (3, 3), padding="SAME",
                             kernel_init=init, dtype=self.dtype)(x)

        trunk = x
        # Explicit names pin the parameter tree to "RRDBBlock_i/..." in both
        # modes (nn.remat's auto-name would be "CheckpointRRDBBlock_i"), so
        # saved models load across remat settings.
        block_cls = nn.remat(RRDBBlock) if self.remat else RRDBBlock
        for i in range(self.num_rrdb_blocks):
            trunk = block_cls(self.num_dense_blocks, self.num_convs,
                              width, self.kernel_size,
                              self.residual_scaling, dtype=self.dtype,
                              growth_channels=self._trunk_growth(),
                              name=f"RRDBBlock_{i}")(trunk)
        # the reference's rrdb-global scaled skip (_build_rrdb_blocks:363-364)
        # feeds the post-trunk conv, and the UNSCALED head skip wraps the
        # conv (:79). Both adds are parameterless — verified bit-exact
        # against the reference's own builder in
        # tests/eval/test_import_keras.py (which caught this: round ≤3
        # omitted the scaled inner skip).
        trunk = x_skip + self.residual_scaling * trunk
        trunk = nn.Conv(width, (self.kernel_size, self.kernel_size),
                        padding="SAME", kernel_init=init, dtype=self.dtype)(trunk)
        return x_skip + trunk

    def _tail(self, x):
        init = scaled_he_normal(0.2)
        scale = self.upsample_factor
        while scale > 1:
            x = SubpixelConvBlock(2, activation=False, kernel_init=init,
                                  dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
            scale //= 2

        x = nn.Conv(self.num_filters, (self.kernel_size, self.kernel_size),
                    padding="SAME", kernel_init=init, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(3, (3, 3), padding="SAME", kernel_init=init,
                    dtype=jnp.float32)(jnp.asarray(x, jnp.float32))
        return jnp.tanh(x)
