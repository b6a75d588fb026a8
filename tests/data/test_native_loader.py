"""Native C++ loader: decode parity with PIL, crop correctness, pipeline
integration, graceful fallback."""

import numpy as np
import pytest
from PIL import Image

from simplesr_tpu.data.native_loader import get_native_loader

LENA = "/root/reference/tests/data/lena.png"
NOISE_DIR = "/root/reference/tests/data/patterns/random_noise"


@pytest.fixture(scope="module")
def loader():
    ldr = get_native_loader()
    if ldr is None:
        pytest.skip("native loader unavailable")
    return ldr


def test_decode_matches_pil(loader):
    ours = loader.load_image(LENA)
    pil = np.asarray(Image.open(LENA).convert("RGB"), np.float32)
    np.testing.assert_array_equal(ours, pil)
    assert loader.image_size(LENA) == (512, 512)


def test_jpeg_decode(loader, tmp_path):
    img = Image.open(LENA).convert("RGB")
    jpath = str(tmp_path / "lena.jpg")
    img.save(jpath, quality=90)
    ours = loader.load_image(jpath)
    pil = np.asarray(Image.open(jpath).convert("RGB"), np.float32)
    np.testing.assert_array_equal(ours, pil)


def test_crops_match_slices(loader):
    pil = np.asarray(Image.open(LENA).convert("RGB"), np.float32)
    tops = np.asarray([0, 100, 400], np.int32)
    lefts = np.asarray([0, 50, 416], np.int32)
    crops = loader.load_crops([LENA] * 3, tops, lefts, 96, 96)
    for i in range(3):
        np.testing.assert_array_equal(
            crops[i], pil[tops[i]:tops[i] + 96, lefts[i]:lefts[i] + 96])


def test_out_of_bounds_crop_fails(loader):
    with pytest.raises(IOError):
        loader.load_crops([LENA], np.asarray([500], np.int32),
                          np.asarray([0], np.int32), 96, 96)


def test_missing_file_fails(loader):
    with pytest.raises(IOError):
        loader.image_size("/no/such/file.png")


def test_corrupt_file_fails_cleanly(loader, tmp_path):
    """Truncated/garbage image bytes must surface as IOError (libpng/libjpeg
    error trampolines), never a crash or a silent wrong-sized buffer."""
    bad_png = tmp_path / "bad.png"
    bad_png.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)  # header only
    with pytest.raises(IOError):
        loader.load_image(str(bad_png))
    truncated = tmp_path / "trunc.jpg"
    img = Image.open(LENA).convert("RGB")
    img.save(str(truncated), quality=90)
    data = truncated.read_bytes()
    truncated.write_bytes(data[:len(data) // 4])
    with pytest.raises(IOError):
        loader.load_image(str(truncated))


def test_pipeline_native_vs_pil_identical_batches():
    """The pipeline must produce identical batches with and without the
    native loader (same seed)."""
    from simplesr_tpu.data import DataPipeline

    def batches(use_native):
        p = DataPipeline(hr_img_path=NOISE_DIR, scale=2, train_val_split=0.25,
                         batch_size=4, crop=True, crop_size=(16, 16, 3),
                         num_crops=2, random_seed=9, use_native=use_native)
        return [(np.asarray(a), np.asarray(b))
                for a, b in p.train_batch_generator()]

    with_native = batches(True)
    without = batches(False)
    assert len(with_native) == len(without)
    for (a1, b1), (a2, b2) in zip(with_native, without):
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)
