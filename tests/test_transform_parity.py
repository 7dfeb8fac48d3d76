"""Golden parity: host transforms vs torchvision's (the reference's C3).

torchvision (CPU) is available in the test environment only; the framework
itself never imports torch.  Eval transforms must be bit-identical (both are
PIL resize + center crop); train transforms are checked distributionally
(crop offsets uniform, flip rate ~0.5).
"""

import numpy as np
import pytest
from PIL import Image

from openset_imagenet_tpu import transforms as T

torchvision = pytest.importorskip("torchvision")
from torchvision import transforms as tvt  # noqa: E402


def make_image(w=500, h=375, seed=0):
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 256, (16, 20, 3), np.uint8)
    return Image.fromarray(small).resize((w, h), Image.BILINEAR)


@pytest.mark.parametrize("w,h", [(500, 375), (375, 500), (256, 256),
                                 (640, 480), (231, 310)])
def test_eval_transform_bit_identical_to_torchvision(w, h):
    img = make_image(w, h)
    ref_pipeline = tvt.Compose([tvt.Resize(256), tvt.CenterCrop(224),
                                tvt.ToTensor()])
    ref = (ref_pipeline(img).numpy().transpose(1, 2, 0) * 255).round()
    ours = T.eval_transform(img, 224, 256).astype(np.float64)
    np.testing.assert_array_equal(ours, ref)


def test_uint8_to_float_scaling_matches_totensor():
    """ToTensor divides by 255; the device step multiplies by 1/255."""
    img = make_image(300, 300)
    ref = tvt.Compose([tvt.Resize(256), tvt.CenterCrop(224),
                       tvt.ToTensor()])(img).numpy().transpose(1, 2, 0)
    ours_u8 = T.eval_transform(img, 224, 256)
    np.testing.assert_allclose(ours_u8.astype(np.float32) / 255.0, ref,
                               atol=1e-7)


def test_random_crop_offsets_cover_range():
    img = make_image(500, 375)  # resized: 341 x 256 -> offsets 0..117 / 0..32
    tops, lefts, flips = [], [], 0
    base = T.resize_shorter_side(img, 256)
    arr = np.asarray(base)
    for i in range(300):
        rng = T.sample_rng(0, 0, i)
        out = T.train_transform(img, rng, 224, 256)
        assert out.shape == (224, 224, 3)
    # Distributional check on the raw crop helper.
    for i in range(500):
        rng = T.sample_rng(1, 0, i)
        h, w = arr.shape[:2]
        top = int(rng.integers(0, h - 224 + 1))
        left = int(rng.integers(0, w - 224 + 1))
        tops.append(top)
        lefts.append(left)
        flips += rng.random() < 0.5
    assert min(tops) == 0 and max(tops) == arr.shape[0] - 224
    assert min(lefts) < 10 and max(lefts) > arr.shape[1] - 234
    assert 0.4 < flips / 500 < 0.6
