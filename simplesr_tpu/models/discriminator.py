"""VGG-style SRGAN/ESRGAN discriminator as a flax module.

Topology parity with reference model_builder.build_discriminator
(/root/reference/simple_sr/utils/models/model_builder.py:137-198):
conv3 64 s1 (no BN) → LReLU → conv3 64 s2 +BN → LReLU → conv blocks at
128/256/512 (each: s1 conv+BN+LReLU, s2 conv+BN+LReLU) → Flatten → Dense 1024
→ LReLU → Dense 1 → sigmoid iff non-relativistic (the relativistic-average
losses consume raw logits, ra_adversarial_loss.py:28). Init: he_normal scale
0.2 (:155-157).

Like the reference (its Flatten forces a fixed input size, :188-189), the
critic requires a static crop size — which is exactly what XLA wants anyway.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from simplesr_tpu.models.blocks import ConvLayer, scaled_he_normal


class Discriminator(nn.Module):
    num_filters: int = 64
    alpha: float = 0.2
    kernel_size: int = 3
    momentum: float = 0.8
    relativistic: bool = False
    dtype: Any = jnp.bfloat16
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        init = scaled_he_normal(0.2)
        a = self.alpha
        x = jnp.asarray(x, self.dtype)

        x = ConvLayer(self.num_filters, self.kernel_size, strides=1,
                      batch_norm=False, kernel_init=init, dtype=self.dtype)(x, train)
        x = nn.leaky_relu(x, a)
        x = ConvLayer(self.num_filters, self.kernel_size, strides=2,
                      batch_norm=True, momentum=self.momentum, kernel_init=init,
                      dtype=self.dtype, bn_axis_name=self.bn_axis_name)(x, train)
        x = nn.leaky_relu(x, a)

        for mult in (2, 4, 8):
            feats = self.num_filters * mult
            x = ConvLayer(feats, self.kernel_size, strides=1, batch_norm=True,
                          momentum=self.momentum, kernel_init=init,
                          dtype=self.dtype, bn_axis_name=self.bn_axis_name)(x, train)
            x = nn.leaky_relu(x, a)
            x = ConvLayer(feats, self.kernel_size, strides=2, batch_norm=True,
                          momentum=self.momentum, kernel_init=init,
                          dtype=self.dtype, bn_axis_name=self.bn_axis_name)(x, train)
            x = nn.leaky_relu(x, a)

        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(1024, kernel_init=init, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, a)
        x = nn.Dense(1, kernel_init=init, dtype=jnp.float32)(
            jnp.asarray(x, jnp.float32))
        if not self.relativistic:
            x = nn.sigmoid(x)
        return x
