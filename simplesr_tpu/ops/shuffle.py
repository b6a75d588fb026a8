"""Pixel shuffle (depth_to_space) and its inverse — the sub-pixel upsample
primitive of SRResNet/ESRGAN (reference model_builder._subpixel_conv_block,
/root/reference/simple_sr/utils/models/model_builder.py:275 uses
tf.nn.depth_to_space).

Implemented as reshape+transpose in TF's DCR channel order so that conv
weights are interchangeable with the reference layout. XLA lowers this to a
free layout change fused into the neighbouring convs.
"""


__all__ = ["depth_to_space", "space_to_depth"]


def depth_to_space(x, block_size):
    """NHWC depth_to_space, TF DCR order: channel index = (i*r + j)*C + c."""
    r = int(block_size)
    b, h, w, c = x.shape
    if c % (r * r) != 0:
        raise ValueError(f"channels {c} not divisible by block_size^2 {r*r}")
    co = c // (r * r)
    x = x.reshape(b, h, w, r, r, co)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h, i, w, j, co
    return x.reshape(b, h * r, w * r, co)


def space_to_depth(x, block_size):
    """Inverse of depth_to_space (same DCR order)."""
    r = int(block_size)
    b, h, w, c = x.shape
    if h % r != 0 or w % r != 0:
        raise ValueError(f"spatial dims ({h},{w}) not divisible by {r}")
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // r, w // r, c * r * r)
