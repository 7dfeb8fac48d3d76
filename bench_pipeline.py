"""Input-pipeline benchmark: host JPEG decode+augment throughput.

Measures end-to-end images/sec of the threaded input pipeline (decode ->
resize(256) -> random-crop(224) -> flip -> batch assembly) for the native
fused libjpeg reader vs the PIL reference path — the reference's
bottleneck-by-design (SURVEY.md §7: DataLoader JPEG decode).

Prints one JSON line per reader; not the driver headline bench (that is
``bench.py``).
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
from PIL import Image

from openset_imagenet_tpu.pipeline import InputPipeline, PILReader
from openset_imagenet_tpu.native.jpeg import (NativeBatchReader,
                                              NativeReader, native_available)


def make_dataset(tmp: Path, n_images=256, size=(500, 375)):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_images):
        # Smooth-ish random field compresses like a photo.
        small = rng.integers(0, 256, (24, 32, 3), np.uint8)
        arr = np.asarray(Image.fromarray(small).resize(size, Image.BILINEAR))
        p = tmp / f"img_{i}.JPEG"
        Image.fromarray(arr).save(p, "JPEG", quality=90)
        paths.append(str(p))
    return paths


def run(reader, paths, batch_size=64, workers=16, epochs=2):
    labels = np.zeros(len(paths), np.int32)
    pipe = InputPipeline(paths, labels, batch_size, is_training=True,
                         num_workers=workers, reader=reader, prefetch=4)
    # warmup epoch, then timed
    for _ in pipe.epoch(0):
        pass
    t0 = time.perf_counter()
    n = 0
    for e in range(1, epochs + 1):
        for batch in pipe.epoch(e):
            n += int(batch.mask.sum())
    dt = time.perf_counter() - t0
    pipe.close()
    return n / dt


def main():
    with tempfile.TemporaryDirectory() as tmp:
        paths = make_dataset(Path(tmp))
        results = {}
        results["pil"] = run(PILReader(), paths)
        if native_available():
            results["native"] = run(NativeReader(), paths)
            results["native_batch"] = run(NativeBatchReader(), paths)
        for name, rate in results.items():
            print(json.dumps({
                "metric": f"input_pipeline_throughput_{name}",
                "value": round(rate, 1), "unit": "imgs/sec/host",
                "vs_baseline": round(rate / results["pil"], 2),
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
