"""Native fused JPEG decoder: parity with the PIL transform path."""

import io

import numpy as np
import pytest
from PIL import Image

from openset_imagenet_tpu import transforms as T
from openset_imagenet_tpu.native import jpeg as nj

pytestmark = pytest.mark.skipif(not nj.native_available(),
                                reason="osijpeg could not be built")


def make_jpeg(w=500, h=375, quality=95):
    x = np.linspace(0, 255, w)[None, :].repeat(h, 0)
    y = np.linspace(0, 255, h)[:, None].repeat(w, 1)
    arr = np.stack([x, y, (x + y) / 2], -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.parametrize("w,h", [(500, 375), (375, 500), (256, 256),
                                 (1024, 683), (300, 240)])
def test_center_crop_matches_pil(w, h):
    data = make_jpeg(w, h)
    out = nj.decode_resize_crop(data, 256, 224)
    assert out is not None and out.shape == (224, 224, 3)
    ref = T.eval_transform(T.decode_image(data), 224, 256)
    diff = np.abs(out.astype(int) - ref.astype(int))
    # DCT-scaled decode + bilinear vs PIL antialiased resize: a few LSB.
    assert diff.mean() < 1.5, diff.mean()
    assert np.percentile(diff, 99) <= 6


def test_size_probe():
    data = make_jpeg(320, 240)
    assert nj.jpeg_size(data) == (320, 240)
    assert nj.jpeg_size(b"not a jpeg") is None


def test_random_crop_and_flip_geometry():
    data = make_jpeg(500, 375)
    a = nj.decode_resize_crop(data, 256, 224, top=0, left=0, flip=False)
    b = nj.decode_resize_crop(data, 256, 224, top=0, left=0, flip=True)
    np.testing.assert_array_equal(a, b[:, ::-1])
    c = nj.decode_resize_crop(data, 256, 224, top=10, left=30, flip=False)
    assert not np.array_equal(a, c)


def test_native_reader_interface(tmp_path):
    from openset_imagenet_tpu.native.jpeg import NativeReader

    data = make_jpeg(400, 300)
    p = tmp_path / "img.JPEG"
    p.write_bytes(data)
    reader = NativeReader(crop=224)
    ev = reader(str(p), None)
    assert ev.shape == (224, 224, 3) and ev.dtype == np.uint8
    tr1 = reader(str(p), T.sample_rng(1, 2, 3))
    tr2 = reader(str(p), T.sample_rng(1, 2, 3))
    np.testing.assert_array_equal(tr1, tr2)  # reproducible augmentation

    # Non-JPEG file falls back to PIL (PNG decodes fine there).
    png = tmp_path / "img.png"
    Image.fromarray(np.zeros((300, 400, 3), np.uint8)).save(png)
    out = reader(str(png), None)
    assert out.shape == (224, 224, 3)


def test_grayscale_jpeg_upconverts_to_rgb():
    """Single-channel JPEGs decode through JCS_RGB as gray RGB."""
    x = np.linspace(0, 255, 400)[None, :].repeat(300, 0).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(x, mode="L").save(buf, "JPEG", quality=92)
    out = nj.decode_resize_crop(buf.getvalue(), 256, 224)
    assert out is not None and out.shape == (224, 224, 3)
    # R==G==B everywhere, and the gradient survives.
    np.testing.assert_array_equal(out[..., 0], out[..., 1])
    np.testing.assert_array_equal(out[..., 0], out[..., 2])
    assert out[..., 0].max() - out[..., 0].min() > 100


def test_progressive_jpeg_matches_baseline_encoding():
    """Progressive streams take a different libjpeg path (whole-image
    coefficient buffer); the window-restricted decode must handle them
    and land on the same pixels as the baseline encoding of the same
    image (identical DCT coefficients -> identical output)."""
    rng = np.random.default_rng(6)
    small = rng.integers(0, 256, (24, 32, 3), np.uint8)
    arr = np.asarray(Image.fromarray(small).resize((500, 375),
                                                   Image.BILINEAR))
    base, prog = io.BytesIO(), io.BytesIO()
    Image.fromarray(arr).save(base, "JPEG", quality=90)
    Image.fromarray(arr).save(prog, "JPEG", quality=90, progressive=True)
    a = nj.decode_resize_crop(base.getvalue(), 256, 224, top=3, left=9)
    b = nj.decode_resize_crop(prog.getvalue(), 256, 224, top=3, left=9)
    assert a is not None and b is not None
    np.testing.assert_array_equal(a, b)


def test_cmyk_jpeg_falls_back_to_pil():
    """ImageNet contains a handful of CMYK JPEGs.  libjpeg cannot convert
    CMYK->RGB, so the native path must FAIL CLEANLY (None, no silently
    wrong pixels) and the batch reader must deliver the PIL-parity pixels
    via its fallback (reference semantics: Image.open().convert('RGB'),
    reference dataset.py:46-48)."""
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (300, 400, 4), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, mode="CMYK").save(buf, "JPEG", quality=90)
    assert nj.decode_resize_crop(buf.getvalue(), 256, 224) is None

    import pathlib
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
        f.write(buf.getvalue())
        path = f.name
    try:
        reader = nj.NativeBatchReader(crop=224, resize=256)
        out = reader.read_batch([path], [None])
        assert out.shape == (1, 224, 224, 3)
        expected = T.eval_transform(T.decode_image(path), 224, 256)
        np.testing.assert_array_equal(out[0], expected)
    finally:
        pathlib.Path(path).unlink()


def test_corrupt_jpeg_returns_none():
    assert nj.decode_resize_crop(b"\xff\xd8garbage", 256, 224) is None


def test_truncated_and_masquerading_files_fail_cleanly():
    """A truncated JPEG stream (error mid-scan, after start_decompress)
    and a PNG masquerading under a .JPEG name (ImageNet famously ships
    one) both return None — the reader then falls back to PIL, which
    handles the PNG and raises on true truncation (reference parity:
    Image.open().convert('RGB') raises there too)."""
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (300, 400, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=90)
    data = buf.getvalue()
    assert nj.decode_resize_crop(data[:len(data) // 2], 256, 224) is None

    png = io.BytesIO()
    Image.fromarray(arr).save(png, "PNG")
    assert nj.decode_resize_crop(png.getvalue(), 256, 224) is None
    # Reader-level: the PNG decodes via the PIL fallback.
    import pathlib
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".JPEG", delete=False) as f:
        f.write(png.getvalue())
        path = f.name
    try:
        out = nj.NativeReader(crop=224, resize=256)(path, None)
        expected = T.eval_transform(T.decode_image(path), 224, 256)
        np.testing.assert_array_equal(out, expected)
    finally:
        pathlib.Path(path).unlink()


def test_truncated_jpeg_rejected_not_gray():
    """Truncated entropy data is only a WARNING to libjpeg (it fakes an
    EOI and fills the rest with gray); the native decoder must REJECT such
    files so the PIL fallback (which raises loudly) handles them, instead
    of silently feeding half-gray images into training."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (300, 400, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    data = buf.getvalue()
    truncated = data[: int(len(data) * 0.6)]
    assert nj.decode_resize_crop(data, 256, 224) is not None
    assert nj.decode_resize_crop(truncated, 256, 224) is None


def test_truncation_below_sampled_window_decodes_clean():
    """Window-restricted decode stops at the crop's last sampled row, so
    corruption strictly BELOW the window never touches output pixels —
    such images decode cleanly (and identically to the intact file)
    instead of being needlessly rejected.  Corruption INSIDE the window
    is still rejected (test above: 60% truncation hits a center crop)."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (800, 300, 3), np.uint8)  # tall: rh=682
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    data = buf.getvalue()
    # top=0 crop samples decoded rows ~[0, 231] of 700 (DCT scale 7/8 of
    # 800 rows); keeping 95% of the stream loses only rows ~665+, far
    # below the window.
    truncated = data[: int(len(data) * 0.95)]
    full = nj.decode_resize_crop(data, 256, 224, top=0, left=0)
    trunc = nj.decode_resize_crop(truncated, 256, 224, top=0, left=0)
    assert full is not None and trunc is not None
    np.testing.assert_array_equal(full, trunc)
    # A crop that DOES reach the lost rows is still rejected.
    assert nj.decode_resize_crop(truncated, 256, 224, top=455,
                                 left=0) is None
