"""ctypes binding + build driver for the native JPEG data path.

Wraps ``native/osijpeg.cpp`` (fused libjpeg decode -> shorter-side resize ->
crop -> flip) and exposes :class:`NativeReader` with the pipeline's reader
interface.  The shared library is compiled on first use with ``g++ -O3``
and cached next to the sources; any failure (no toolchain, no libjpeg,
corrupt file) degrades gracefully to the PIL reader, so the native path is
a pure acceleration.

Corrupt-input divergence from PIL (intentional, tested): the native decoder
is window-restricted — it stops consuming scanlines once the crop window is
filled (``osijpeg.cpp`` decode loop), so a truncated/damaged JPEG whose
damage lies entirely BELOW the sampled rows decodes cleanly, while the
PIL path (and the reference's torchvision loader) scans to EOI and raises.
Acceptance can therefore depend on crop position under random-crop
training: the same damaged file may decode natively for a top crop and
fall back to PIL (raising) for a bottom crop.  This trades strict
whole-file validation for not paying decode cost on rows that are
immediately discarded; pipelines that must reject every damaged file
byte-for-byte like the reference should use ``reader="pil"``
(``tests/test_native_jpeg.py::test_truncation_below_sampled_window_
decodes_clean`` locks the behavior).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "osijpeg.cpp"
_LIB_PATH = _SRC.parent / "libosijpeg.so"
_lock = threading.Lock()
_lib = None
_lib_error: Optional[str] = None


def _build_library() -> Path:
    # Compile to a process-unique temp name + atomic rename: concurrent
    # processes (sweep children, train+evaluate) may race on the first
    # build, and `g++ -o` writes the output non-atomically — a reader
    # dlopen'ing a half-written .so would silently degrade to PIL.
    tmp = _LIB_PATH.with_suffix(f".{os.getpid()}.tmp")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           str(_SRC), "-o", str(tmp), "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB_PATH)
    finally:
        tmp.unlink(missing_ok=True)
    return _LIB_PATH


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_error
    with _lock:
        if _lib is not None or _lib_error is not None:
            return _lib
        try:
            if not _LIB_PATH.exists() or \
                    _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
                _build_library()
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.osi_decode_resize_crop.restype = ctypes.c_int
            lib.osi_decode_resize_crop.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
            lib.osi_jpeg_size.restype = ctypes.c_int
            lib.osi_jpeg_size.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.osi_decode_batch.restype = ctypes.c_int
            lib.osi_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
            lib.osi_decode_batch_mem.restype = ctypes.c_int
            lib.osi_decode_batch_mem.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
            _lib = lib
        except Exception as exc:  # toolchain/libjpeg missing
            _lib_error = str(exc)
            _lib = None
        return _lib


def native_available() -> bool:
    return load_library() is not None


def decode_resize_crop(data: bytes, resize: int, crop: int,
                       top: int = -1, left: int = -1,
                       flip: bool = False) -> Optional[np.ndarray]:
    """Fused decode; returns ``uint8 [crop, crop, 3]`` or None on failure."""
    lib = load_library()
    if lib is None:
        return None
    out = np.empty((crop, crop, 3), np.uint8)
    rc = lib.osi_decode_resize_crop(
        data, len(data), resize, crop, top, left, int(flip),
        out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return out


def jpeg_size(data: bytes):
    """(width, height) of a JPEG, or None."""
    lib = load_library()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.osi_jpeg_size(data, len(data), ctypes.byref(w),
                         ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def pil_replay(source, resize: int, crop: int, top=None, left=None,
               utop: float = -1.0, uleft: float = -1.0,
               flip: bool = False) -> np.ndarray:
    """PIL fallback applying the SAME crop geometry as the native path.

    ``top``/``left`` are integer offsets in resized coordinates (None ->
    derive from the fractional ``utop``/``uleft`` draws; both negative ->
    center crop).  Single source of truth for every native reader's
    fallback, so geometry conventions cannot drift between copies.
    """
    from .. import transforms as Tr

    img = Tr.decode_image(source)
    arr = np.asarray(Tr.resize_shorter_side(img, resize), dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    arr = Tr._pad_to(arr, crop)
    h, w = arr.shape[:2]
    if top is None:
        top = (int(utop * (max(h - crop, 0) + 1)) if utop >= 0
               else Tr.center_crop_offset(h, crop))
    if left is None:
        left = (int(uleft * (max(w - crop, 0) + 1)) if uleft >= 0
                else Tr.center_crop_offset(w, crop))
    top = min(max(int(top), 0), max(h - crop, 0))
    left = min(max(int(left), 0), max(w - crop, 0))
    arr = arr[top:top + crop, left:left + crop]
    if flip:
        arr = arr[:, ::-1]
    return np.ascontiguousarray(arr)


def decode_batch(paths, utop=None, uleft=None, flips=None, resize=256,
                 crop=224, threads: Optional[int] = None):
    """Decode ``paths`` into one ``uint8 [N, crop, crop, 3]`` batch.

    ``utop``/``uleft`` are per-image fractional crop positions in ``[0, 1)``
    (or ``< 0`` / ``None`` for center crops); ``flips`` per-image booleans.
    Runs a C++ thread pool that releases the GIL for the whole batch.
    Returns ``(images, ok)`` where ``ok[i]`` is False for images that must
    be decoded by a fallback path.
    """
    lib = load_library()
    if lib is None:
        return None, None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(
        *[str(p).encode() for p in paths])
    out = np.empty((n, crop, crop, 3), np.uint8)
    ok = np.zeros(n, np.uint8)

    def as_float_ptr(arr, fill):
        a = (np.full(n, fill, np.float32) if arr is None
             else np.asarray(arr, np.float32))
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    ut, ut_p = as_float_ptr(utop, -1.0)
    ul, ul_p = as_float_ptr(uleft, -1.0)
    fl = (np.zeros(n, np.uint8) if flips is None
          else np.asarray(flips, np.uint8))
    if threads is None:
        threads = min(n, os.cpu_count() or 1)
    lib.osi_decode_batch(
        c_paths, n, ut_p, ul_p,
        fl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        resize, crop, int(threads),
        out.ctypes.data_as(ctypes.c_void_p),
        ok.ctypes.data_as(ctypes.c_void_p))
    return out, ok.astype(bool)


def decode_batch_mem(blobs, resize=256, crop=224,
                     threads: Optional[int] = None):
    """Decode in-memory JPEG ``blobs`` into one ``uint8 [N, crop, crop, 3]``
    center-cropped batch via the C++ thread pool (GIL released for the
    whole batch) — the serving daemon's bulk-request decode path.

    Returns ``(images, ok)`` where ``ok[i]`` is False for blobs the native
    decoder rejects (caller falls back to :func:`pil_replay` for those);
    ``(None, None)`` when the native library is unavailable.
    """
    lib = load_library()
    if lib is None:
        return None, None
    n = len(blobs)
    blobs = [bytes(b) for b in blobs]  # pin buffers for the C call
    c_bufs = (ctypes.c_char_p * n)(*blobs)
    c_lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    out = np.empty((n, crop, crop, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    if threads is None:
        threads = min(n, os.cpu_count() or 1)
    lib.osi_decode_batch_mem(
        c_bufs, c_lens, n, None, None, None, resize, crop, int(threads),
        out.ctypes.data_as(ctypes.c_void_p),
        ok.ctypes.data_as(ctypes.c_void_p))
    return out, ok.astype(bool)


class NativeBatchReader:
    """Whole-batch reader: C++ thread-pool decode, one GIL-free call.

    Augmentation contract: for training, each sample draws
    ``(u_top, u_left, u_flip)`` as three ``rng.random()`` values from its
    counter-based stream — reproducible across runs; eval uses center
    crops.  Per-image failures are replayed through PIL with the same
    geometry.
    """

    def __init__(self, crop: int = 224, resize: int = 256,
                 threads: Optional[int] = None):
        if crop > resize:
            raise ValueError(f"crop {crop} exceeds shorter-side resize "
                             f"{resize}")
        self.crop = crop
        self.resize = resize
        self.threads = threads

    def read_batch(self, paths, rngs) -> np.ndarray:
        n = len(paths)
        # Clamp below 1.0: a float32-rounded draw of exactly 1.0 would map
        # one past the last valid crop offset.
        max_u = np.nextafter(np.float32(1.0), np.float32(0.0))
        utop = np.full(n, -1.0, np.float32)
        uleft = np.full(n, -1.0, np.float32)
        flips = np.zeros(n, np.uint8)
        for i, rng in enumerate(rngs):
            if rng is not None:
                utop[i] = min(np.float32(rng.random()), max_u)
                uleft[i] = min(np.float32(rng.random()), max_u)
                flips[i] = rng.random() < 0.5
        images, ok = decode_batch(paths, utop, uleft, flips, self.resize,
                                  self.crop, self.threads)
        if images is None:  # library unavailable: decode all via PIL
            images = np.empty((n, self.crop, self.crop, 3), np.uint8)
            ok = np.zeros(n, bool)
        for i in np.nonzero(~ok)[0]:
            images[i] = pil_replay(paths[i], self.resize, self.crop,
                                   utop=float(utop[i]),
                                   uleft=float(uleft[i]),
                                   flip=bool(flips[i]))
        return images


class NativeReader:
    """Pipeline reader: native fused path with PIL fallback per image.

    Matches :class:`openset_imagenet_tpu.pipeline.PILReader` semantics:
    ``rng=None`` -> center crop (eval); otherwise random crop + hflip(0.5)
    with the same draw order as the host transforms (crop offsets first,
    then the flip coin), so augmentation streams stay reproducible.
    """

    def __init__(self, crop: int = 224, resize: int = 256):
        if crop > resize:
            raise ValueError(f"crop {crop} exceeds shorter-side resize "
                             f"{resize}")
        self.crop = crop
        self.resize = resize
        from ..pipeline import PILReader
        self._fallback = PILReader(crop=crop, resize=resize)

    def __call__(self, path, rng) -> np.ndarray:
        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError:
            return self._fallback(path, rng)
        if rng is None:
            out = decode_resize_crop(data, self.resize, self.crop)
            return out if out is not None else self._fallback(path, rng)

        size = jpeg_size(data)
        if size is None:
            return self._fallback(path, rng)
        from .. import transforms as Tr
        rw, rh = Tr.resized_geometry(*size, self.resize)
        # Same draw order as transforms.random_crop + hflip.
        top = int(rng.integers(0, max(rh - self.crop, 0) + 1))
        left = int(rng.integers(0, max(rw - self.crop, 0) + 1))
        flip = bool(rng.random() < 0.5)
        out = decode_resize_crop(data, self.resize, self.crop, top, left,
                                 flip)
        if out is not None:
            return out
        # Native decode failed after the draws were consumed: replay the
        # SAME crop/flip via PIL so the augmentation stream stays identical
        # to the pure-PIL pipeline for this (seed, epoch, index).
        return pil_replay(data, self.resize, self.crop, top=top, left=left,
                          flip=flip)
