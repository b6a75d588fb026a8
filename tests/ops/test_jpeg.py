"""JPEG-degrade semantics: monotone quality→fidelity curve, agreement with a
real libjpeg round-trip (PIL) within a few dB, jittability."""

import io

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from simplesr_tpu.ops import jpeg_degrade, psnr
from simplesr_tpu.ops.jpeg import ijg_quant_tables


def _lena01():
    img = np.asarray(Image.open("/root/reference/tests/data/lena.png"), dtype=np.float32)
    return img[:128, :128] / 255.0


def _pil_jpeg(img01, quality):
    im = Image.fromarray((img01 * 255).round().astype(np.uint8))
    buf = io.BytesIO()
    im.save(buf, format="JPEG", quality=int(quality))
    buf.seek(0)
    return np.asarray(Image.open(buf), dtype=np.float32) / 255.0


def test_quality_monotone():
    img = _lena01()
    psnrs = [float(psnr(img, jpeg_degrade(img, q), max_val=1.0)) for q in (10, 30, 50, 80, 95)]
    assert all(a < b for a, b in zip(psnrs, psnrs[1:])), psnrs
    assert psnrs[0] < 32.0          # q=10 must visibly degrade
    assert psnrs[-1] > 36.5         # q=95 nearly transparent (matches libjpeg ≈37.0 here)


@pytest.mark.parametrize("quality", [10, 25, 50, 75])
def test_tracks_real_libjpeg(quality):
    """Within ~3 dB of an actual libjpeg round trip at every quality."""
    img = _lena01()
    ours = np.asarray(jpeg_degrade(img, quality))
    real = _pil_jpeg(img, quality)
    psnr_ours = float(psnr(img, jnp.asarray(ours), max_val=1.0))
    psnr_real = float(psnr(img, jnp.asarray(real), max_val=1.0))
    assert abs(psnr_ours - psnr_real) < 3.0, (quality, psnr_ours, psnr_real)
    # and our artifacted image resembles the real artifacted image
    assert float(psnr(jnp.asarray(ours), jnp.asarray(real), max_val=1.0)) > 25.0


def test_quant_tables_ijg_pivot():
    luma50, _ = ijg_quant_tables(50)
    np.testing.assert_array_equal(np.asarray(luma50)[0, :3], [16, 11, 10])
    luma100, chroma100 = ijg_quant_tables(100)
    np.testing.assert_array_equal(np.asarray(luma100), np.ones((8, 8)))
    np.testing.assert_array_equal(np.asarray(chroma100), np.ones((8, 8)))


def test_jittable_with_traced_quality():
    img = _lena01()[None]
    f = jax.jit(jpeg_degrade)
    out = f(img, jnp.int32(30))
    assert out.shape == img.shape
    assert float(jnp.max(out)) <= 1.0 and float(jnp.min(out)) >= 0.0


def test_odd_sizes():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(37, 53, 3)).astype(np.float32)
    out = jpeg_degrade(img, 40)
    assert out.shape == img.shape
