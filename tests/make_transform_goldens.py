"""Generate ``tests/goldens/transforms_golden.npz`` (run once, commit result).

The reference composes ``Resize(256) -> CenterCrop(224) -> ToTensor`` from
torchvision (reference ``script/evaluate.py:86-89``).  torchvision is not
installed in every environment, so the goldens are produced by an
INDEPENDENT transcription of torchvision's PIL backend semantics
(``torchvision/transforms/functional_pil.py``):

* ``Resize(size)``: no-op when the short side already equals ``size``;
  otherwise short side -> ``size``, long side -> ``int(size*long/short)``
  (truncating), ``img.resize((new_w, new_h), Image.BILINEAR)``.
* ``CenterCrop(size)``: ``crop_top = int(round((h - size) / 2.0))`` — note
  Python round-half-to-even, not floor — then ``img.crop``.
* ``ToTensor``: /255, applied on device in this framework; goldens stay
  uint8.

These functions deliberately do NOT import ``openset_imagenet_tpu`` — the
fixture pins the reference behaviour, and ``test_transform_parity`` checks
the framework against it in every environment.
"""

from pathlib import Path

import numpy as np
from PIL import Image

GOLDEN_PATH = Path(__file__).parent / "goldens" / "transforms_golden.npz"
# (w, h) inputs; (231, 310) resizes to 256 x 343 whose height-224 delta is
# 119 ≡ 3 (mod 4) — the case where round-half-even and floor offsets differ.
SIZES = [(500, 375), (375, 500), (256, 256), (640, 480), (231, 310),
         (686, 512), (512, 686), (300, 224)]
CROP, RESIZE = 224, 256


def make_image(w: int, h: int, seed: int = 0) -> Image.Image:
    """Deterministic smooth test image (upscaled small noise)."""
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 256, (16, 20, 3), np.uint8)
    return Image.fromarray(small).resize((w, h), Image.BILINEAR)


def torchvision_resize(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w <= h:
        new_w, new_h = size, int(size * h / w)
    else:
        new_w, new_h = int(size * w / h), size
    return img.resize((new_w, new_h), Image.BILINEAR)


def torchvision_center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def reference_eval_pipeline(img: Image.Image) -> np.ndarray:
    out = torchvision_center_crop(torchvision_resize(img, RESIZE), CROP)
    return np.asarray(out, dtype=np.uint8)


def main():
    GOLDEN_PATH.parent.mkdir(exist_ok=True)
    arrays = {}
    for i, (w, h) in enumerate(SIZES):
        arrays[f"eval_{w}x{h}"] = reference_eval_pipeline(
            make_image(w, h, seed=i))
    np.savez_compressed(GOLDEN_PATH, **arrays)
    print(f"wrote {GOLDEN_PATH} "
          f"({GOLDEN_PATH.stat().st_size / 1024:.0f} KiB, "
          f"{len(arrays)} goldens)")


if __name__ == "__main__":
    main()
