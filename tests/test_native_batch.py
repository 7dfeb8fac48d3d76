"""Native batch loader: parity with per-image decode, fallback, pipeline."""

import numpy as np
import pytest
from PIL import Image

from openset_imagenet_tpu import transforms as T
from openset_imagenet_tpu.native import jpeg as nj

pytestmark = pytest.mark.skipif(not nj.native_available(),
                                reason="osijpeg could not be built")


@pytest.fixture(scope="module")
def jpeg_tree(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (w, h) in enumerate([(500, 375), (375, 500), (300, 300),
                                (640, 480)] * 4):
        small = rng.integers(0, 256, (24, 32, 3), np.uint8)
        arr = np.asarray(Image.fromarray(small).resize((w, h),
                                                       Image.BILINEAR))
        p = tmp / f"img_{i}.JPEG"
        Image.fromarray(arr).save(p, "JPEG", quality=90)
        paths.append(str(p))
    return paths


def test_batch_center_matches_per_image(jpeg_tree):
    imgs, ok = nj.decode_batch(jpeg_tree, resize=256, crop=224, threads=4)
    assert ok.all()
    for i in (0, 1, 7):
        with open(jpeg_tree[i], "rb") as f:
            one = nj.decode_resize_crop(f.read(), 256, 224)
        np.testing.assert_array_equal(imgs[i], one)


def test_batch_reader_reproducible_and_flips(jpeg_tree):
    r = nj.NativeBatchReader(crop=224)
    rngs = lambda: [T.sample_rng(1, 0, i) for i in range(len(jpeg_tree))]
    a = r.read_batch(jpeg_tree, rngs())
    b = r.read_batch(jpeg_tree, rngs())
    np.testing.assert_array_equal(a, b)
    # Different epoch -> different crops somewhere.
    c = r.read_batch(jpeg_tree,
                     [T.sample_rng(1, 1, i) for i in range(len(jpeg_tree))])
    assert not np.array_equal(a, c)


def test_non_jpeg_falls_back_to_pil(jpeg_tree, tmp_path):
    png = tmp_path / "actually_a_png.JPEG"
    Image.fromarray(np.full((300, 400, 3), 77, np.uint8)).save(png, "PNG")
    r = nj.NativeBatchReader(crop=224)
    out = r.read_batch([jpeg_tree[0], str(png)], [None, None])
    assert out.shape == (2, 224, 224, 3)
    assert np.all(out[1] == 77)


def test_pipeline_batch_mode(jpeg_tree):
    from openset_imagenet_tpu.pipeline import InputPipeline

    labels = np.arange(len(jpeg_tree), dtype=np.int32)
    pipe = InputPipeline(jpeg_tree, labels, batch_size=8, is_training=True,
                         seed=3, num_workers=2,
                         reader=nj.NativeBatchReader(crop=64, resize=96))
    batches = list(pipe.epoch(0))
    assert len(batches) == 2
    assert batches[0].images.shape == (8, 64, 64, 3)
    # Whole-epoch label multiset preserved.
    got = np.sort(np.concatenate([b.labels for b in batches]))
    np.testing.assert_array_equal(got, np.sort(labels))
    pipe.close()


def test_batch_mem_matches_per_image(jpeg_tree):
    """In-memory batch decode (the serving bulk path) is bitwise the
    single-shot center-crop decode for every blob."""
    blobs = [open(p, "rb").read() for p in jpeg_tree]
    imgs, ok = nj.decode_batch_mem(blobs, resize=256, crop=224, threads=4)
    assert ok.all()
    for i in range(len(blobs)):
        np.testing.assert_array_equal(
            imgs[i], nj.decode_resize_crop(blobs[i], 256, 224))


def test_batch_mem_flags_bad_blobs(jpeg_tree):
    blobs = [open(jpeg_tree[0], "rb").read(), b"not a jpeg", b""]
    imgs, ok = nj.decode_batch_mem(blobs, resize=256, crop=224)
    assert list(ok) == [True, False, False]
    np.testing.assert_array_equal(
        imgs[0], nj.decode_resize_crop(blobs[0], 256, 224))


def test_serve_decode_many_parity_with_fallback(jpeg_tree, tmp_path):
    """decode_many_to_input == per-blob decode_to_input, including a PNG
    that the native decoder rejects (PIL replay fallback in place)."""
    from openset_imagenet_tpu.serve import decode_many_to_input, decode_to_input

    png = tmp_path / "x.png"
    rng = np.random.default_rng(3)
    Image.fromarray(rng.integers(0, 256, (300, 400, 3), np.uint8)).save(png)
    blobs = [open(jpeg_tree[0], "rb").read(), png.read_bytes(),
             open(jpeg_tree[1], "rb").read()]
    many = decode_many_to_input(blobs, 224)
    assert len(many) == 3
    for got, blob in zip(many, blobs):
        np.testing.assert_array_equal(got, decode_to_input(blob, 224))
