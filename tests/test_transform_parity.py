"""Golden parity: host transforms vs the reference torchvision pipeline (C3).

The committed fixture ``goldens/transforms_golden.npz`` holds outputs of an
independent transcription of torchvision's PIL-backend ``Resize(256) ->
CenterCrop(224)`` (see ``make_transform_goldens.py``), so the bit-exactness
check runs in EVERY environment.  When torchvision happens to be installed,
an extra test validates directly against it (and the golden generator).
"""

import numpy as np
import pytest
from PIL import Image

from openset_imagenet_tpu import transforms as T
from tests.make_transform_goldens import (CROP, GOLDEN_PATH, RESIZE, SIZES,
                                          make_image,
                                          reference_eval_pipeline)


@pytest.fixture(scope="module")
def goldens():
    return np.load(GOLDEN_PATH)


@pytest.mark.parametrize("i,wh", list(enumerate(SIZES)))
def test_eval_transform_matches_committed_golden(i, wh, goldens):
    w, h = wh
    img = make_image(w, h, seed=i)
    ours = T.eval_transform(img, CROP, RESIZE)
    np.testing.assert_array_equal(ours, goldens[f"eval_{w}x{h}"])


@pytest.mark.parametrize("i,wh", list(enumerate(SIZES)))
def test_native_fallback_replay_matches_golden(i, wh, goldens, tmp_path):
    """The native reader's PIL fallback path uses the same geometry."""
    from openset_imagenet_tpu.native.jpeg import pil_replay

    w, h = wh
    # pil_replay decodes from a file; PNG keeps the pixels lossless.
    path = tmp_path / f"img_{i}.png"
    make_image(w, h, seed=i).save(path)
    ours = pil_replay(path, RESIZE, CROP)
    np.testing.assert_array_equal(ours, goldens[f"eval_{w}x{h}"])


def test_center_crop_offset_rounds_half_to_even():
    """torchvision: int(round(d/2.0)); differs from floor at d ≡ 3 (mod 4)."""
    for extent in range(224, 600):
        d = extent - 224
        assert T.center_crop_offset(extent, 224) == int(round(d / 2.0)), d


def test_golden_231x310_hits_the_rounding_case():
    """(231, 310) resizes to 256 x 343; a floor-based crop is 1 px off."""
    img = make_image(231, 310, seed=4)
    resized = np.asarray(T.resize_shorter_side(img, RESIZE))
    assert resized.shape[0] == 343  # d = 119, d % 4 == 3
    golden = reference_eval_pipeline(img)
    floor_crop = resized[(343 - CROP) // 2:(343 - CROP) // 2 + CROP,
                         16:16 + CROP]
    assert not np.array_equal(floor_crop, golden)
    np.testing.assert_array_equal(T.eval_transform(img, CROP, RESIZE), golden)


def test_uint8_to_float_scaling_matches_totensor():
    """ToTensor divides by 255; the device step multiplies by 1/255."""
    img = make_image(300, 300)
    ref = reference_eval_pipeline(img).astype(np.float32) / 255.0
    ours_u8 = T.eval_transform(img, CROP, RESIZE)
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


def test_against_installed_torchvision_if_available():
    """Direct torchvision check (skipped where torchvision is absent)."""
    torchvision = pytest.importorskip("torchvision")
    from torchvision import transforms as tvt

    for i, (w, h) in enumerate(SIZES):
        img = make_image(w, h, seed=i)
        ref_pipeline = tvt.Compose([tvt.Resize(RESIZE), tvt.CenterCrop(CROP),
                                    tvt.ToTensor()])
        ref = (ref_pipeline(img).numpy().transpose(1, 2, 0) * 255).round()
        np.testing.assert_array_equal(
            T.eval_transform(img, CROP, RESIZE).astype(np.float64), ref)
        np.testing.assert_array_equal(reference_eval_pipeline(img), ref)
