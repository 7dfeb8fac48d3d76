"""Confidence and AUC metrics.

* :func:`confidence` / :func:`confidence_sums` — parity with reference
  ``metrics.py:8-42`` (vast-style γ confidence): known confidence is the mean
  softmax score of the *true* class; negative confidence is the mean of
  ``1 + offset - max(scores[:, :last_valid_class])`` over rows labeled as the
  unknown class.  The regime-dependent parameters (``offset``,
  ``unknown_class``, ``last_valid_class``) are chosen by the caller exactly as
  in reference ``train.py:156-163``.

  :func:`confidence_sums` is the TPU-first streaming form: it returns the
  masked *sums* and *counts* for one batch so the engine can accumulate them
  on device across an epoch without materialising the full ``[N, C]`` score
  matrix in HBM (the reference materialises it at ``train.py:167-185``; the
  final averages are identical).

* :func:`predict_objectosphere` — parity with reference ``metrics.py:45-62``.
* :func:`auc_score_binary` / :func:`auc_score_multiclass` — parity with
  reference ``metrics.py:65-106`` (host-side sklearn; these are dead code in
  the reference's main paths but kept for API completeness).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _score_region_max(scores: jnp.ndarray, last_valid_class: Optional[int]):
    """max over scores[:, :last_valid_class] (None -> all columns)."""
    if last_valid_class is None:
        region = scores
    else:
        region = scores[:, :last_valid_class]
    return jnp.max(region, axis=-1)


def confidence_sums(
    scores: jnp.ndarray,
    target_labels: jnp.ndarray,
    offset: float = 0.0,
    unknown_class: int = -1,
    last_valid_class: Optional[int] = None,
    sample_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Streaming (per-batch) confidence aggregates.

    Returns ``(kn_sum, kn_count, neg_sum, neg_count)`` where
    ``kn_sum / kn_count`` and ``neg_sum / neg_count`` reproduce the reference
    averages over the union of all batches.  jit/pjit-safe; padded rows are
    excluded via ``sample_mask``.
    """
    scores = scores.astype(jnp.float32)
    mask = (jnp.ones(target_labels.shape, jnp.float32)
            if sample_mask is None else sample_mask.astype(jnp.float32))
    unknown = (target_labels == unknown_class)
    known = (target_labels >= 0) & (~unknown)
    kn_f = known.astype(jnp.float32) * mask
    neg_f = unknown.astype(jnp.float32) * mask

    num_classes = scores.shape[-1]
    safe_labels = jnp.clip(target_labels, 0, num_classes - 1)
    true_score = jnp.take_along_axis(scores, safe_labels[:, None], axis=-1)[:, 0]
    kn_sum = jnp.sum(true_score * kn_f)

    neg_val = 1.0 + offset - _score_region_max(scores, last_valid_class)
    neg_sum = jnp.sum(neg_val * neg_f)
    return kn_sum, jnp.sum(kn_f), neg_sum, jnp.sum(neg_f)


def confidence(
    scores,
    target_labels,
    offset: float = 0.0,
    unknown_class: int = -1,
    last_valid_class: Optional[int] = None,
) -> Tuple[float, int, float, int]:
    """Whole-array confidence, reference signature.

    Parity: reference ``metrics.py:8-42`` — returns
    ``(kn_conf, kn_count, neg_conf, neg_count)`` with confidences of 0.0 when
    the corresponding count is zero.
    """
    scores = jnp.asarray(scores)
    target_labels = jnp.asarray(target_labels)
    kn_sum, kn_count, neg_sum, neg_count = confidence_sums(
        scores, target_labels, offset=offset, unknown_class=unknown_class,
        last_valid_class=last_valid_class)
    kn_count_i = int(kn_count)
    neg_count_i = int(neg_count)
    kn_conf = float(kn_sum) / kn_count_i if kn_count_i else 0.0
    neg_conf = float(neg_sum) / neg_count_i if neg_count_i else 0.0
    return kn_conf, kn_count_i, neg_conf, neg_count_i


def predict_objectosphere(logits, features, threshold):
    """Class/score prediction thresholded by ``||features|| * max_softmax``.

    Parity: reference ``metrics.py:45-62``: samples whose feature-norm ×
    max-softmax product falls below ``threshold`` are predicted ``-1``.
    Returns a ``[B, 2]`` array of ``(pred_class, pred_score)``.
    """
    logits = jnp.asarray(logits)
    features = jnp.asarray(features)
    scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    pred_score = jnp.max(scores, axis=-1)
    pred_class = jnp.argmax(scores, axis=-1).astype(jnp.float32)
    norms = jnp.linalg.norm(features.astype(jnp.float32), axis=-1)
    unk = (norms * pred_score) < threshold
    pred_class = jnp.where(unk, -1.0, pred_class)
    return jnp.stack((pred_class, pred_score), axis=1)


def auc_score_binary(target_labels, pred_scores, unk_class: int = -1):
    """Binary AUC of known (+1) vs unknown (-1) on the max softmax score.

    Parity: reference ``metrics.py:65-92``.  Host-side (sklearn).
    """
    import sklearn.metrics

    target_labels = np.asarray(target_labels).copy()
    pred_scores = np.asarray(pred_scores)
    max_scores = np.max(pred_scores, axis=1)
    known = target_labels != unk_class
    target_labels[known] = 1
    target_labels[~known] = -1
    return sklearn.metrics.roc_auc_score(target_labels, max_scores)


def auc_score_multiclass(target_labels, pred_scores):
    """One-vs-rest multiclass AUC.  Parity: reference ``metrics.py:95-106``."""
    import sklearn.metrics

    target_labels = np.asarray(target_labels)
    pred_scores = np.asarray(pred_scores)
    return sklearn.metrics.roc_auc_score(target_labels, pred_scores,
                                         multi_class="ovr")


def loss_regime_params(loss_type: str, n_classes: int):
    """Validation-confidence regime parameters per loss type.

    Parity: reference ``train.py:156-163`` — garbage uses
    ``offset=0, unknown_class=C-1, last_valid_class=-1``; entropic/softmax use
    ``offset=1/C, unknown_class=-1, last_valid_class=None``.
    """
    if loss_type == "garbage":
        return dict(offset=0.0, unknown_class=n_classes - 1,
                    last_valid_class=-1)
    return dict(offset=1.0 / n_classes, unknown_class=-1,
                last_valid_class=None)
