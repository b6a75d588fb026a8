"""On-device JPEG degradation — the TPU equivalent of
tf.image.adjust_jpeg_quality (used by the reference for noisy-LR training,
/root/reference/simple_sr/data_pipeline/data_pipeline.py:318-330 and
image_transforms.adjust_jpg_quality:295).

TF round-trips through libjpeg on the host CPU, which would serialize the
input pipeline. Here the codec's *lossy* stages are simulated entirely on
device as dense math the MXU eats: uint8 quantization → JFIF RGB→YCbCr →
4:2:0 chroma subsampling → 8×8 blockwise DCT-II (einsum with the orthonormal
DCT matrix) → quantization against IJG tables scaled by the quality factor →
dequantize → IDCT → chroma upsample → RGB. Entropy coding is lossless and
therefore skipped. The result is not bit-identical to libjpeg (its fancy
upsampling and integer DCT differ slightly) but reproduces the artifact
structure and degradation-vs-quality curve; quality semantics follow the IJG
50-point pivot exactly. Fully jittable, quality may be a traced scalar.
"""

import numpy as np
import jax.numpy as jnp

__all__ = ["jpeg_degrade", "ijg_quant_tables"]

# Standard IJG (Annex K) luminance / chrominance quantization tables.
_LUMA_TABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float32)

_CHROMA_TABLE = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float32)


def _dct_matrix():
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    d = np.cos(np.pi * (2 * n + 1) * k / 16.0)
    d[0] *= np.sqrt(1.0 / 8.0)
    d[1:] *= np.sqrt(2.0 / 8.0)
    return d.astype(np.float32)


_DCT = _dct_matrix()


def ijg_quant_tables(quality):
    """Quality-scaled (luma, chroma) tables; IJG jpeg_quality_scaling rule.
    ``quality`` may be a traced int/float in [1, 100]."""
    q = jnp.clip(jnp.asarray(quality, jnp.float32), 1.0, 100.0)
    scale = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)
    def _scaled(table):
        t = jnp.floor((table * scale + 50.0) / 100.0)
        return jnp.clip(t, 1.0, 255.0)
    return _scaled(jnp.asarray(_LUMA_TABLE)), _scaled(jnp.asarray(_CHROMA_TABLE))


def _blockwise_dct_quant_roundtrip(chan, qtable):
    """chan: (..., H, W) level-shifted; H, W multiples of 8."""
    h, w = chan.shape[-2], chan.shape[-1]
    d = jnp.asarray(_DCT)
    blocks = chan.reshape(chan.shape[:-2] + (h // 8, 8, w // 8, 8))
    coeffs = jnp.einsum("ij,...ajbl,kl->...aibk", d, blocks, d,
                        precision="highest")
    coeffs = jnp.round(coeffs / qtable[..., :, None, :]) * qtable[..., :, None, :]
    out = jnp.einsum("ji,...ajbl,lk->...aibk", d, coeffs, d,
                     precision="highest")
    return out.reshape(chan.shape)


def _fancy_upsample2x(c):
    """libjpeg 'fancy' (triangle) chroma upsampling, separable per axis:
    out[2i] = (3·c[i] + c[i-1]) / 4, out[2i+1] = (3·c[i] + c[i+1]) / 4,
    with edge replication."""
    def _axis(x, ax):
        n = x.shape[ax]
        idx_prev = jnp.maximum(jnp.arange(n) - 1, 0)
        idx_next = jnp.minimum(jnp.arange(n) + 1, n - 1)
        prev = jnp.take(x, idx_prev, axis=ax)
        nxt = jnp.take(x, idx_next, axis=ax)
        even = (3.0 * x + prev) / 4.0
        odd = (3.0 * x + nxt) / 4.0
        stacked = jnp.stack([even, odd], axis=ax + 1)
        new_shape = list(x.shape)
        new_shape[ax] *= 2
        return stacked.reshape(new_shape)

    c = _axis(c, c.ndim - 2)
    c = _axis(c, c.ndim - 1)
    return c


def _pad_to_multiple(x, m, axes):
    pads = [(0, 0)] * x.ndim
    for ax in axes:
        pads[ax] = (0, (-x.shape[ax]) % m)
    return jnp.pad(x, pads, mode="edge")


def jpeg_degrade(img, quality, subsample=True):
    """JPEG-compress-then-decompress an image in [0, 1].

    Args:
      img: (..., H, W, 3) float array in [0, 1].
      quality: scalar in [1, 100] (may be traced); lower = more degradation.
      subsample: 4:2:0 chroma subsampling (libjpeg default).

    Returns: degraded image, same shape, clipped to [0, 1], float32.
    """
    x = jnp.asarray(img, jnp.float32)
    h, w = x.shape[-3], x.shape[-2]
    # TF converts to uint8 before encoding.
    x = jnp.clip(jnp.round(x * 255.0), 0.0, 255.0)

    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    luma_t, chroma_t = ijg_quant_tables(quality)

    y = _pad_to_multiple(y - 128.0, 8, (-2, -1))
    y = _blockwise_dct_quant_roundtrip(y, luma_t)[..., :h, :w]

    def _chroma(c):
        if subsample:
            c2 = _pad_to_multiple(c, 2, (-2, -1))
            h2, w2 = c2.shape[-2], c2.shape[-1]
            c_sub = c2.reshape(c2.shape[:-2] + (h2 // 2, 2, w2 // 2, 2)).mean(axis=(-3, -1))
        else:
            c_sub = c
        c_sub = _pad_to_multiple(c_sub - 128.0, 8, (-2, -1))
        c_sub = _blockwise_dct_quant_roundtrip(c_sub, chroma_t) + 128.0
        if subsample:
            hs, ws = (h + 1) // 2, (w + 1) // 2
            c_sub = c_sub[..., :hs, :ws]
            c_up = _fancy_upsample2x(c_sub)
            return c_up[..., :h, :w]
        return c_sub[..., :h, :w]

    cb = _chroma(cb)
    cr = _chroma(cr)
    y = y + 128.0

    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(out), 0.0, 255.0) / 255.0
