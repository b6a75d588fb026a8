"""Model family: SRResNet, RRDB/ESRGAN, discriminator, VGG features.

Replaces the reference's Keras graph builders
(/root/reference/simple_sr/utils/models/model_builder.py) with flax modules.
``build_generator_model`` keeps the reference's string-dispatch surface
(model_builder.build_or_load_generator_model:13)."""

from simplesr_tpu.models.srresnet import SRResNet, ResBlock
from simplesr_tpu.models.rrdb import RRDBNet, RRDBBlock, DenseBlock
from simplesr_tpu.models.discriminator import Discriminator
from simplesr_tpu.models.vgg import (
    VGGFeatures,
    vgg_layer_names,
    load_vgg_weights_npz,
    init_vgg_params,
)
from simplesr_tpu.models.blocks import PReLU, ConvLayer, SubpixelConvBlock
from simplesr_tpu.models.polyphase import (
    SRResNetPolyphase,
    polyphase_model,
    polyphase_variables,
)
from simplesr_tpu.models.paired import (
    SRResNetPaired,
    SRResNetPairedPolyphase,
    RRDBNetPaired,
    paired_model,
    paired_variables,
    rrdb_paired_model,
    rrdb_paired_variables,
)


def build_generator_model(upsample_factor, architecture="srresnet", num_blocks=16,
                          num_filters=64, kernel_size=3, residual_scaling=0.2,
                          batch_norm=True, num_convs=4, num_dense_blocks=3,
                          dtype=None, growth_channels=None, remat=False):
    """String-dispatched generator construction (reference
    model_builder.build_or_load_generator_model, :13-39). Returns an
    *uninitialized* flax module; parameter loading is handled by the
    checkpoint layer (train.checkpointing)."""
    import jax.numpy as jnp
    from simplesr_tpu.core.dtypes import default_policy

    dtype = jnp.dtype(dtype).type if isinstance(dtype, str) else \
        (dtype or default_policy().compute_dtype)
    if callable(architecture):
        return architecture()
    if architecture == "rrdb":
        return RRDBNet(upsample_factor=upsample_factor, num_filters=num_filters,
                       num_rrdb_blocks=num_blocks, num_dense_blocks=num_dense_blocks,
                       num_convs=num_convs, kernel_size=kernel_size,
                       residual_scaling=residual_scaling, dtype=dtype,
                       growth_channels=growth_channels, remat=remat)
    if architecture == "srresnet":
        return SRResNet(upsample_factor=upsample_factor, num_filters=num_filters,
                        num_res_blocks=num_blocks, batch_norm=batch_norm,
                        dtype=dtype, remat=remat)
    raise ValueError("architecture not recognized")


__all__ = [
    "SRResNet", "ResBlock", "RRDBNet", "RRDBBlock", "DenseBlock",
    "Discriminator", "VGGFeatures", "vgg_layer_names", "load_vgg_weights_npz",
    "init_vgg_params", "PReLU", "ConvLayer", "SubpixelConvBlock",
    "SRResNetPolyphase", "polyphase_model", "polyphase_variables",
    "SRResNetPaired", "SRResNetPairedPolyphase", "paired_model",
    "paired_variables", "RRDBNetPaired", "rrdb_paired_model",
    "rrdb_paired_variables",
    "build_generator_model",
]
