"""TPU input pipeline: threaded host decode feeding prefetched device batches.

This replaces the reference's ``torch.utils.data.DataLoader(num_workers=N,
pin_memory=True)`` (reference ``train.py:299-311``) with a TPU-appropriate
design:

* **Threaded decode pool** — JPEG decode and the geometric transforms
  release the GIL inside PIL's C core, so threads (not processes) saturate
  host CPUs without pickling/IPC overhead.
* **Static shapes** — every batch is padded to exactly ``batch_size`` and
  carries a ``mask``; jit never sees a ragged shape, so there is exactly one
  compilation.  Losses/metrics are mask-aware (see ``ops/``), which makes the
  padded rows exact no-ops (SURVEY.md §7 hard part (c)).
* **uint8 host->device transfer** — images cross PCIe as ``uint8`` and are
  converted to ``bfloat16 [0, 1]`` on device inside the jitted step
  (4x less transfer than float32).
* **Sharded device_put** — batches are placed directly with a
  ``NamedSharding`` over the ``data`` mesh axis; with multiple hosts each
  process decodes only its own shard of the index space.
* **Bounded lookahead** — a producer thread keeps ``prefetch`` batches in
  flight; ``jax.device_put`` is async so the H2D copy of batch k+1 overlaps
  the compute of batch k (replaces ``pin_memory``).

Order/shuffle parity: the reference shuffles the train set each epoch and
iterates val in order (``train.py:299-311``).  Shuffling here is a
``(seed, epoch)``-keyed permutation, reproducible across runs and resumes.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, NamedTuple, Optional

import numpy as np

from . import transforms as T


class Batch(NamedTuple):
    """One device batch: uint8 images, int32 labels, float32 validity mask."""

    images: object  # [B, H, W, 3] uint8 (jax.Array once on device)
    labels: object  # [B] int32
    mask: object    # [B] float32; 0.0 rows are padding


class PILReader:
    """Default sample reader: JPEG file -> transformed uint8 crop.

    ``rng=None`` selects the eval transform (center crop); otherwise the
    train transform (random crop + flip) driven by the given generator.
    """

    def __init__(self, crop: int = 224, resize: int = 256):
        if crop > resize:
            raise ValueError(f"crop {crop} exceeds shorter-side resize "
                             f"{resize}; the crop window must fit the "
                             "resized image")
        self.crop = crop
        self.resize = resize

    def __call__(self, path, rng) -> np.ndarray:
        img = T.decode_image(path)
        if rng is None:
            return T.eval_transform(img, self.crop, self.resize)
        return T.train_transform(img, rng, self.crop, self.resize)


class SyntheticReader:
    """Deterministic noise reader for tests and device-throughput benches."""

    def __init__(self, crop: int = 224, seed: int = 0):
        self.crop = crop
        self.seed = seed
        self._cache = {}

    def __call__(self, path, rng) -> np.ndarray:
        import zlib
        # Stable across processes/runs (unlike built-in hash, which is
        # randomized per process); small pool keeps decode cost ~0.
        key = zlib.crc32(str(path).encode()) % 64
        if key not in self._cache:
            self._cache[key] = T.synthetic_image(
                key, size=(self.crop, self.crop), seed=self.seed)
        return self._cache[key]


class InputPipeline:
    """Iterable over device-resident, statically-shaped, masked batches.

    Args:
        paths: array/list of absolute sample paths (or arbitrary tokens for
            synthetic readers).
        labels: int array of the same length.
        batch_size: global batch size (padded, never ragged).
        is_training: shuffle each epoch + random augmentation when True.
        seed: base seed for shuffle/augmentation streams.
        num_workers: decode threads (reference default 4,
            ``config/train.yaml:20``; more is usually better on TPU hosts).
        reader: ``reader(path, rng_or_None) -> uint8 [H, W, 3]``.
        sharding: optional ``jax.sharding.Sharding`` for direct sharded
            placement; None keeps batches as host numpy (tests).
        prefetch: batches kept in flight ahead of the consumer.
        process_index / process_count: multi-host SPMD loading.  Every
            process computes the same global batch order; each decodes only
            its contiguous ``batch_size / process_count`` slice of every
            batch and contributes it to the global array via
            ``jax.make_array_from_process_local_data``.  Single-process
            (the default) bypasses all of this.
    """

    def __init__(self, paths, labels, batch_size: int, is_training: bool,
                 seed: int = 42, num_workers: int = 16,
                 reader: Optional[Callable] = None, sharding=None,
                 prefetch: int = 2, drop_remainder: bool = False,
                 process_index: int = 0, process_count: int = 1):
        self.paths = np.asarray(paths, dtype=object)
        self.labels = np.asarray(labels, dtype=np.int32)
        if len(self.paths) != len(self.labels):
            raise ValueError("paths and labels length mismatch")
        self.batch_size = int(batch_size)
        self.is_training = bool(is_training)
        self.seed = int(seed)
        self.num_workers = int(num_workers)
        self.reader = reader if reader is not None else PILReader()
        self.sharding = sharding
        self.prefetch = max(1, int(prefetch))
        self.drop_remainder = bool(drop_remainder)
        self.process_index = int(process_index)
        self.process_count = int(process_count)
        if self.batch_size % self.process_count:
            raise ValueError(
                f"global batch {self.batch_size} not divisible by "
                f"process_count {self.process_count}")
        self._local_rows = self.batch_size // self.process_count
        self._pool = ThreadPoolExecutor(
            max_workers=self.num_workers,
            thread_name_prefix="osi-decode")

    # -- sizing ------------------------------------------------------------
    @property
    def num_samples(self) -> int:
        """Global sample count (all processes see the same batches)."""
        return len(self.paths)

    def __len__(self) -> int:
        """Global batches per epoch (identical on every process)."""
        n = self.num_samples
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    # -- epoch iteration ----------------------------------------------------
    def _epoch_order(self, epoch: int) -> np.ndarray:
        """Global sample order; identical on every process (same seed)."""
        n = len(self.paths)
        if self.is_training:
            return T.philox(self.seed, epoch, 0, 2).permutation(n)
        return np.arange(n)

    def _local_slice(self, order: np.ndarray, batch_idx: int) -> np.ndarray:
        """This process's rows of global batch ``batch_idx`` (-1 = pad)."""
        lo = batch_idx * self.batch_size
        global_idxs = order[lo:lo + self.batch_size]
        if len(global_idxs) < self.batch_size:
            pad = self.batch_size - len(global_idxs)
            global_idxs = np.concatenate(
                [global_idxs, np.full(pad, -1, global_idxs.dtype)])
        lr = self._local_rows
        return global_idxs[self.process_index * lr:
                           (self.process_index + 1) * lr]

    def _load(self, index: int, epoch: int) -> np.ndarray:
        rng = (T.sample_rng(self.seed, epoch, int(index))
               if self.is_training else None)
        return self.reader(self.paths[index], rng)

    def _load_batch(self, idxs: np.ndarray, epoch: int) -> Batch:
        """Whole-batch load via a ``read_batch`` reader (one GIL-free call)."""
        real = idxs[idxs >= 0]
        rngs = [T.sample_rng(self.seed, epoch, int(i))
                if self.is_training else None for i in real]
        images = self.reader.read_batch([self.paths[i] for i in real], rngs)
        return self._assemble(idxs, images)

    def epoch(self, epoch: int = 0, start_batch: int = 0) -> Iterator[Batch]:
        """Yield the batches of one epoch, prefetched onto device.

        ``start_batch`` skips the first k batches of the epoch without
        decoding them — because the order and the per-sample augmentation
        are pure functions of ``(seed, epoch, global index)``, the suffix
        is bitwise-identical to the suffix of a full iteration.  This is
        the substrate for step-granular (mid-epoch) checkpoint resume.
        """
        order = self._epoch_order(epoch)
        nb = len(self)
        start_batch = int(start_batch)
        if not 0 <= start_batch <= nb:
            raise ValueError(f"start_batch {start_batch} outside the "
                             f"epoch's [0, {nb}] batch range")
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        batch_mode = hasattr(self.reader, "read_batch")

        def submit(batch_idx):
            idxs = self._local_slice(order, batch_idx)
            if batch_mode:
                # One future per batch; the reader's own (C++) thread pool
                # parallelises items and releases the GIL for the call.
                return idxs, self._pool.submit(self._load_batch, idxs, epoch)
            return idxs, [self._pool.submit(self._load, i, epoch)
                          for i in idxs if i >= 0]

        def produce():
            try:
                # Keep up to prefetch+1 batches of futures in flight.
                window = []
                b = start_batch
                submitted = start_batch
                while b < nb and not stop.is_set():
                    while submitted < min(nb, b + self.prefetch + 1):
                        window.append(submit(submitted))
                        submitted += 1
                    idxs, futs = window.pop(0)
                    if batch_mode:
                        out_q.put(futs.result())
                    else:
                        imgs = [f.result() for f in futs]
                        out_q.put(self._assemble(idxs, imgs))
                    b += 1
                out_q.put(None)
            except BaseException as exc:  # surface worker errors to consumer
                out_q.put(exc)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit promptly.
            while producer.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    producer.join(timeout=0.1)

    # -- batch assembly -----------------------------------------------------
    def _assemble(self, idxs: np.ndarray, imgs) -> Batch:
        """Local rows -> statically-shaped (masked) arrays, placed on device.

        ``idxs`` are this process's rows of the global batch (``-1`` = pad);
        ``imgs`` holds decoded images for the non-pad rows, in order.
        """
        idxs = np.asarray(idxs)
        real = idxs >= 0
        n_real = int(real.sum())
        if isinstance(imgs, np.ndarray) and imgs.ndim == 4:
            decoded = imgs
        elif n_real:
            decoded = np.stack(imgs)
        else:
            crop = int(getattr(self.reader, "crop", 224))
            decoded = np.zeros((0, crop, crop, 3), np.uint8)

        lr = len(idxs)
        if n_real == lr:
            images = decoded
            labels = self.labels[idxs]
            mask = np.ones(lr, np.float32)
        else:
            images = np.zeros((lr, *decoded.shape[1:]),
                              decoded.dtype if n_real else np.uint8)
            labels = np.zeros(lr, np.int32)
            mask = np.zeros(lr, np.float32)
            pos = np.nonzero(real)[0]
            images[pos] = decoded
            labels[pos] = self.labels[idxs[real]]
            mask[pos] = 1.0
            if n_real:
                # Fill pad rows with recycled REAL images (mask stays 0):
                # losses/metrics ignore them exactly, while train-mode
                # batch-norm statistics see natural pixels instead of
                # zero frames that would drag the batch mean/variance.
                pad_pos = np.nonzero(~real)[0]
                images[pad_pos] = decoded[
                    np.arange(len(pad_pos)) % n_real]

        batch = Batch(images=images, labels=labels, mask=mask)
        if self.sharding is not None:
            import jax
            if self.process_count > 1:
                batch = Batch(*(jax.make_array_from_process_local_data(
                    self.sharding, x) for x in batch))
            else:
                batch = Batch(*(jax.device_put(x, self.sharding)
                                for x in batch))
        return batch

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)


def pipeline_from_dataset(dataset, batch_size: int, is_training: bool,
                          **kwargs) -> InputPipeline:
    """Build a pipeline from an :class:`ImagenetDataset` index.

    Joins the dataset's relative paths with its ``imagenet_path`` root
    (reference ``dataset.py:46``).
    """
    root = dataset.imagenet_path
    paths = [str(root / p) for p in dataset.paths]
    return InputPipeline(paths, dataset.labels, batch_size, is_training,
                         **kwargs)
