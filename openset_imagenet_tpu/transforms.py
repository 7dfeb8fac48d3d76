"""Host-side image decode + augmentation with torchvision-parity semantics.

The reference composes torchvision transforms (reference ``train.py:259-268``,
``script/evaluate.py:86-89``):

* train: ``Resize(256) -> RandomCrop(224) -> RandomHorizontalFlip(0.5) -> ToTensor``
* eval:  ``Resize(256) -> CenterCrop(224) -> ToTensor``

and — deliberately — applies **no mean/std normalization**: pixels stay in
``[0, 1]`` (SURVEY.md C3).

TPU-first split of responsibilities: everything *variable-shaped* (JPEG
decode, aspect-preserving shorter-side resize, crop, flip) happens here on
the host and yields fixed-shape ``uint8 [H, W, 3]`` arrays; the ``/255``
float conversion happens **on device** in the jitted train step (uint8
host->device transfer is 4x cheaper than float32).

Randomness is counter-based: each sample's crop/flip draws come from a
Philox stream keyed by ``(seed, epoch, sample_index)``, so results are
reproducible regardless of worker-thread scheduling — unlike the reference's
global-torch-RNG transforms.
"""

from __future__ import annotations

import io
from typing import Tuple

import numpy as np

try:  # PIL is available in this image (bundled with torchvision).
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


# --------------------------------------------------------------------------
# Decode + geometric ops
# --------------------------------------------------------------------------

def decode_image(path_or_bytes) -> "Image.Image":
    """Open a JPEG (path or raw bytes) as an RGB PIL image.

    Parity: reference ``dataset.py:46-48`` (``Image.open(...).convert("RGB")``).
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        img = Image.open(io.BytesIO(path_or_bytes))
    else:
        img = Image.open(path_or_bytes)
    return img.convert("RGB")


def resize_shorter_side(img, size: int = 256):
    """Aspect-preserving resize so the shorter side equals ``size``.

    Parity: ``torchvision.transforms.Resize(256)`` on a PIL image — bilinear,
    antialiased (PIL's resize is always antialiased), and the long side
    TRUNCATES like torchvision's ``_compute_resized_output_size``
    (``int(size * long / short)``).  No-op if the shorter side already
    equals ``size``.
    """
    w, h = img.size
    if w <= h:
        if w == size:
            return img
        new_w, new_h = size, max(1, int(size * h / w))
    else:
        if h == size:
            return img
        new_w, new_h = max(1, int(size * w / h)), size
    return img.resize((new_w, new_h), Image.BILINEAR)


def resized_geometry(w: int, h: int, size: int):
    """(rw, rh) after :func:`resize_shorter_side` — shared by all readers."""
    if w <= h:
        return size, max(1, int(size * h / w))
    return max(1, int(size * w / h)), size


def center_crop_offset(extent: int, size: int) -> int:
    """torchvision's center-crop offset: ``int(round((extent-size)/2.0))``.

    Python's ``round`` is half-to-even, NOT floor — the two differ by one
    pixel whenever ``extent - size ≡ 3 (mod 4)`` (e.g. a 343-wide resized
    image).  Single source of truth for every crop path (host transforms,
    native decoder fallback, C++ kernel mirrors the same formula).
    """
    d = max(0, int(extent) - int(size))
    k = d // 2
    if d % 2 and k % 2:  # x.5 rounds to the even neighbour
        k += 1
    return k


def center_crop(arr: np.ndarray, size: int = 224) -> np.ndarray:
    """Center crop of an ``[H, W, C]`` array (pads if smaller, like tv)."""
    h, w = arr.shape[:2]
    if h < size or w < size:
        arr = _pad_to(arr, size)
        h, w = arr.shape[:2]
    top = center_crop_offset(h, size)
    left = center_crop_offset(w, size)
    return arr[top:top + size, left:left + size]


def random_crop(arr: np.ndarray, size: int, rng: np.random.Generator
                ) -> np.ndarray:
    """Uniform random crop (torchvision ``RandomCrop`` semantics)."""
    h, w = arr.shape[:2]
    if h < size or w < size:
        arr = _pad_to(arr, size)
        h, w = arr.shape[:2]
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return arr[top:top + size, left:left + size]


def _pad_to(arr: np.ndarray, size: int) -> np.ndarray:
    """Zero-pad an image so both spatial dims are >= ``size``."""
    h, w = arr.shape[:2]
    ph, pw = max(0, size - h), max(0, size - w)
    if not (ph or pw):
        return arr
    return np.pad(arr, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2),
                        (0, 0)))


# --------------------------------------------------------------------------
# Whole-sample transforms
# --------------------------------------------------------------------------

def philox(seed: int, epoch: int, index: int, stream: int
           ) -> np.random.Generator:
    """Counter-based RNG keyed by (seed, epoch, index, stream).

    numpy's Philox takes a 2x64-bit array key; the four 32-bit-ish fields are
    packed into it, making every (sample, epoch) draw reproducible under any
    worker-thread scheduling.
    """
    k0 = (np.uint64(seed & 0xFFFFFFFF) << np.uint64(32)) | np.uint64(
        epoch & 0xFFFFFFFF)
    k1 = (np.uint64(index & 0x3FFFFFFFFFFFFFFF) << np.uint64(2)) | np.uint64(
        stream & 0x3)
    return np.random.Generator(np.random.Philox(key=np.array([k0, k1])))


def sample_rng(seed: int, epoch: int, index: int) -> np.random.Generator:
    """Per-sample augmentation RNG: reproducible under any threading."""
    return philox(seed, epoch, index, 0)


def train_transform(img, rng: np.random.Generator, crop: int = 224,
                    resize: int = 256) -> np.ndarray:
    """Resize(256) -> RandomCrop(224) -> HFlip(0.5); returns uint8 HWC."""
    arr = np.asarray(resize_shorter_side(img, resize), dtype=np.uint8)
    if arr.ndim == 2:  # grayscale safety (convert("RGB") normally prevents)
        arr = np.stack([arr] * 3, axis=-1)
    arr = random_crop(arr, crop, rng)
    if rng.random() < 0.5:
        arr = arr[:, ::-1]
    return np.ascontiguousarray(arr)


def eval_transform(img, crop: int = 224, resize: int = 256) -> np.ndarray:
    """Resize(256) -> CenterCrop(224); returns uint8 HWC."""
    arr = np.asarray(resize_shorter_side(img, resize), dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return np.ascontiguousarray(center_crop(arr, crop))


def synthetic_image(index: int, size: Tuple[int, int] = (256, 256),
                    seed: int = 0) -> np.ndarray:
    """Deterministic uint8 noise image for tests/benchmarks (no JPEG tree)."""
    rng = philox(seed, 0, index, 1)
    return rng.integers(0, 256, size=(*size, 3), dtype=np.uint8)
