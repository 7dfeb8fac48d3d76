"""CSV-driven ImageNet dataset index with open-set label surgery.

Parity with the reference dataset layer (``dataset.py:10-86``): a protocol
CSV lists ``relative_jpeg_path,int_label`` rows where labels are ``0..N-1``
for known classes, ``-1`` for negatives (known unknowns) and ``-2`` for
unknowns (test only).  The three loss regimes each need different label
surgery before training:

* ``garbage``  — ``replace_negative_label()``: ``-1`` becomes the extra
  background class ``label_count - 1`` (reference ``dataset.py:60-68``).
* ``softmax``  — ``remove_negative_label()``: rows with label < 0 are dropped
  from the *training* set only (reference ``dataset.py:70-74``).
* ``entropic`` — no surgery; the loss consumes negative labels natively.

Unlike the reference (a torch ``Dataset`` doing per-item JPEG decode), this
class is a pure *index*: it owns the path/label arrays and the label
bookkeeping, while decoding and batching live in the TPU input pipeline
(:mod:`openset_imagenet_tpu.pipeline`), which consumes the arrays wholesale.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


class ImagenetDataset:
    """Index over a protocol CSV: relative JPEG paths plus integer labels."""

    def __init__(self, csv_file, imagenet_path, transform=None):
        """Args mirror reference ``dataset.py:13-27``.

        Args:
            csv_file: path to a ``p{P}_{split}.csv`` protocol file
                (no header; columns: path, label).
            imagenet_path: root of the ILSVRC2012 tree the paths are
                relative to.
            transform: optional host-side transform (see
                :mod:`openset_imagenet_tpu.transforms`); stored for the
                pipeline to use.
        """
        self.dataset = pd.read_csv(csv_file, header=None)
        self.imagenet_path = Path(imagenet_path)
        self.transform = transform
        self.label_count = len(self.dataset[1].unique())
        self.unique_classes = np.sort(self.dataset[1].unique())

    def __len__(self) -> int:
        return len(self.dataset)

    # -- array accessors used by the input pipeline ------------------------
    @property
    def paths(self) -> np.ndarray:
        """Relative JPEG paths as a numpy object array."""
        return self.dataset[0].to_numpy()

    @property
    def labels(self) -> np.ndarray:
        """Labels as an int32 numpy array."""
        return self.dataset[1].to_numpy().astype(np.int32)

    def absolute_path(self, index: int) -> Path:
        return self.imagenet_path / self.dataset.iloc[index, 0]

    # -- label surgery (parity with reference dataset.py:56-86) ------------
    def has_negatives(self) -> bool:
        """True if the dataset contains negative (-1) samples."""
        return -1 in self.unique_classes

    def replace_negative_label(self) -> None:
        """Replace label ``-1`` with ``label_count - 1`` (garbage regime).

        Parity: reference ``dataset.py:60-68`` — the biggest label is
        ``label_count - 1`` since ``-1`` is part of the unique label set.
        """
        biggest_label = self.label_count - 1
        self.dataset[1] = self.dataset[1].replace(-1, biggest_label)
        self.unique_classes[self.unique_classes == -1] = biggest_label
        self.unique_classes.sort()

    def remove_negative_label(self) -> None:
        """Drop all rows with label < 0 (softmax training regime).

        Parity: reference ``dataset.py:70-74``.
        """
        self.dataset = self.dataset[self.dataset[1] >= 0].reset_index(drop=True)
        self.unique_classes = np.sort(self.dataset[1].unique())
        self.label_count = len(self.dataset[1].unique())

    def calculate_class_weights(self) -> np.ndarray:
        """Balanced class weights ``len(ds) / (count_c * label_count)``.

        Parity: reference ``dataset.py:77-86`` (weights ordered by ascending
        class label, as produced by the groupby there).
        """
        counts = self.dataset.groupby(1).count().to_numpy()
        class_weights = len(self.dataset) / (counts * self.label_count)
        return np.squeeze(class_weights).astype(np.float32)
