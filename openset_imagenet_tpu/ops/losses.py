"""Open-set classification losses as pure logit-space JAX functions.

Behavioral parity with the reference loss layer:

* ``entropic_openset_loss``  == reference ``losses.py:7-29``
  (EntropicOpensetLoss: soft-target cross-entropy; rows with label >= 0 get a
  one-hot target, rows with label < 0 get the uniform target ``w / C``).
* ``softmax_loss``           == ``torch.nn.CrossEntropyLoss(ignore_index=-1)``
  as wired at reference ``train.py:341-343`` (rows with negative label are
  excluded from the mean).
* ``garbage_loss``           == ``torch.nn.CrossEntropyLoss(weight=w)`` as
  wired at reference ``train.py:344-347`` (class-weighted cross-entropy whose
  mean is normalised by the summed weights of the participating rows).

All three are written TPU-first: fully vectorised, static-shape, mask-aware
(so padded ragged final batches contribute nothing), and returning
``(loss_sum_weight, weight)`` style aggregates is avoided in favour of a
``sample_weight`` argument — each function returns the *mean* loss exactly as
the torch criterion would, plus the effective row count/weight so streaming
epoch averages can be formed without recomputation.

Everything here is differentiable and safe under ``jax.jit`` / ``pjit`` with
sharded batch axes: the reductions over the batch axis become cross-device
collectives automatically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable log-softmax in float32 accumulation."""
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def _resolve_mask(labels: jnp.ndarray, sample_mask) -> jnp.ndarray:
    if sample_mask is None:
        return jnp.ones(labels.shape, dtype=jnp.float32)
    return sample_mask.astype(jnp.float32)


def entropic_openset_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    unk_weight: float = 1.0,
    sample_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Entropic open-set loss (soft-target cross-entropy).

    Known rows (label >= 0) get one-hot targets; negative rows (label < 0) get
    the uniform target ``unk_weight / C`` in every class, driving their softmax
    towards maximum entropy.  Parity: reference ``losses.py:16-29`` composed
    with ``torch.nn.CrossEntropyLoss`` soft-target semantics
    (mean over batch of ``-sum_c target_c * log_softmax_c``).

    Args:
        logits: ``[B, C]`` float array.
        labels: ``[B]`` int array; ``0..C-1`` known, ``< 0`` negative.
        unk_weight: weight ``w`` of the uniform target rows
            (``config/train.yaml:26`` in the reference).
        sample_mask: optional ``[B]`` 0/1 mask; masked rows (batch padding)
            are excluded from the mean.

    Returns:
        ``(mean_loss, count)`` — the batch-mean loss and the number of rows
        that participated (for streaming epoch averages).
    """
    num_classes = logits.shape[-1]
    log_p = _log_softmax(logits)
    known = labels >= 0
    # Clip so one_hot stays in-range for negative labels; those rows are
    # overwritten by the uniform target anyway.
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0, num_classes - 1), num_classes,
                             dtype=jnp.float32)
    uniform = jnp.full((num_classes,), unk_weight / num_classes,
                       dtype=jnp.float32)
    targets = jnp.where(known[:, None], one_hot, uniform[None, :])
    per_row = -jnp.sum(targets * log_p, axis=-1)
    mask = _resolve_mask(labels, sample_mask)
    count = jnp.sum(mask)
    mean = jnp.sum(per_row * mask) / jnp.maximum(count, 1.0)
    return mean, count


def softmax_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    sample_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain cross-entropy ignoring negative labels.

    Parity: ``torch.nn.CrossEntropyLoss(ignore_index=-1)`` at reference
    ``train.py:341-343``: rows whose label is negative contribute neither to
    the numerator nor the denominator of the mean.  (The reference only ever
    sees ``-1`` here; we ignore every ``label < 0`` which is a superset and
    identical on the reference's data.)

    Returns ``(mean_loss, count_of_valid_rows)``.
    """
    num_classes = logits.shape[-1]
    log_p = _log_softmax(logits)
    valid = (labels >= 0).astype(jnp.float32) * _resolve_mask(labels, sample_mask)
    safe_labels = jnp.clip(labels, 0, num_classes - 1)
    nll = -jnp.take_along_axis(log_p, safe_labels[:, None], axis=-1)[:, 0]
    count = jnp.sum(valid)
    mean = jnp.sum(nll * valid) / jnp.maximum(count, 1.0)
    return mean, count


def garbage_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray,
    sample_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-weighted cross-entropy for the background-class ("garbage") regime.

    Negative labels have already been remapped to the extra background class
    ``C-1`` by the dataset layer (reference ``dataset.py:60-68``), so every
    label is a valid class index.  Parity:
    ``torch.nn.CrossEntropyLoss(weight=class_weights)`` — the mean is
    ``sum_i w_{y_i} * nll_i / sum_i w_{y_i}`` (weighted-mean normalisation).

    Returns ``(weighted_mean_loss, summed_row_weights)``.
    """
    num_classes = logits.shape[-1]
    log_p = _log_softmax(logits)
    safe_labels = jnp.clip(labels, 0, num_classes - 1)
    nll = -jnp.take_along_axis(log_p, safe_labels[:, None], axis=-1)[:, 0]
    row_w = class_weights.astype(jnp.float32)[safe_labels]
    row_w = row_w * _resolve_mask(labels, sample_mask)
    wsum = jnp.sum(row_w)
    mean = jnp.sum(nll * row_w) / jnp.maximum(wsum, 1e-12)
    return mean, wsum


class AverageMeter:
    """Running (weighted) average tracker.

    Parity: reference ``losses.py:32-60`` — tracks ``val``, ``sum``, ``count``
    and ``avg``; ``update(val, count)`` adds ``val * count`` to the sum.
    Host-side bookkeeping only (no device code).
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, count=1):
        val = float(val)
        count = float(count)
        self.val = val
        self.sum += val * count
        self.count += count
        self.avg = self.sum / self.count if self.count else 0

    def __repr__(self):
        return f"{self.avg:3.3f}"


class EarlyStopping:
    """Stop training when a monitored metric stops improving.

    Parity: reference ``losses.py:65-94`` — ``delta`` threshold, ``patience``
    epochs, score negated when monitoring a loss.
    """

    def __init__(self, patience: int = 100, delta: float = 0.0):
        self.patience = patience
        self.delta = delta
        self.counter = 0
        self.best_score = None
        self.early_stop = False

    def __call__(self, metrics: float, loss: bool = True):
        score = -metrics if loss else metrics
        if self.best_score is None:
            self.best_score = score
        elif score < self.best_score + self.delta:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self.counter = 0
