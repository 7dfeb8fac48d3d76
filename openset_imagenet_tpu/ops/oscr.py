"""Open-Set Classification Rate (OSCR) computation.

Parity: reference ``util.py:90-122`` (``calculate_oscr``).  The reference
sweeps a Python loop over every unique true-class score τ and computes

* ``CCR(τ)`` — fraction of known samples that are correctly classified AND
  whose true-class score exceeds τ;
* ``FPR(τ)`` — fraction of unknown samples (label == ``unk_label``) whose max
  score exceeds τ;

for ``τ ∈ unique(target_scores)[:-1]``.  That loop is O(U·N).  This module
computes the identical values in O(N log N) with sort + ``searchsorted``
(count of elements strictly greater than τ), which matters on the ~50k-sample
test sets; a jit-compatible on-device variant is provided as well.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def calculate_oscr(gt: np.ndarray, scores: np.ndarray,
                   unk_label: int = -1) -> Tuple[np.ndarray, np.ndarray]:
    """CCR/FPR pairs over all unique true-class score thresholds.

    Args:
        gt: ``[N]`` integer labels (``>= 0`` known; ``-1`` negative /
            ``-2`` unknown).
        scores: ``[N, C]`` (or ``[N, C+1]``) float score matrix.  For garbage
            models the caller drops the background column first (reference
            ``util.py:186-188``).
        unk_label: which label counts as "unknown" for the FPR axis.

    Returns:
        ``(ccr, fpr)`` float arrays of identical length.
    """
    gt = np.asarray(gt).astype(int)
    scores = np.asarray(scores)
    kn = gt >= 0
    unk = gt == unk_label

    total_kn = np.sum(kn)
    total_unk = np.sum(unk)

    pred_class = np.argmax(scores, axis=1)
    max_score = np.max(scores, axis=1)
    target_score = scores[kn][range(int(kn.sum())), gt[kn]]

    taus = np.unique(target_score)[:-1]
    if taus.size == 0:
        return np.array([]), np.array([])

    # Count(x > tau) == len(x) - searchsorted(sorted(x), tau, side="right").
    correct_scores = np.sort(target_score[pred_class[kn] == gt[kn]])
    unk_max_scores = np.sort(max_score[unk])

    ccr = (correct_scores.size
           - np.searchsorted(correct_scores, taus, side="right")) / total_kn
    # Deliberate divergence: with zero unknowns the reference divides 0/0
    # into NaN (util.py:118); FPR is defined as 0 here instead.
    fpr = (unk_max_scores.size
           - np.searchsorted(unk_max_scores, taus, side="right")) / max(total_unk, 1)
    return ccr.astype(float), fpr.astype(float)


def calculate_oscr_reference(gt, scores, unk_label=-1):
    """Direct O(U·N) transcription of the reference loop, for golden tests."""
    gt = np.asarray(gt).astype(int)
    scores = np.asarray(scores)
    kn = gt >= 0
    unk = gt == unk_label
    total_kn = np.sum(kn)
    total_unk = np.sum(unk)
    ccr, fpr = [], []
    pred_class = np.argmax(scores, axis=1)
    max_score = np.max(scores, axis=1)
    target_score = scores[kn][range(int(kn.sum())), gt[kn]]
    for tau in np.unique(target_score)[:-1]:
        ccr.append(((pred_class[kn] == gt[kn]) & (target_score > tau)).sum()
                   / total_kn)
        fpr.append((unk & (max_score > tau)).sum() / total_unk)
    return np.array(ccr), np.array(fpr)


def calculate_oscr_jax(gt, scores, unk_label: int = -1,
                       num_thresholds: int = 0):
    """On-device OSCR: jit-compatible, static-shape variant.

    Instead of the data-dependent ``unique(target_scores)`` threshold set
    (dynamic shape — not expressible under jit), sweeps either every sorted
    true-class score (``num_thresholds=0``, length N_known vector with
    duplicates) or an evenly-spaced quantile subset.  CCR/FPR values at
    equal thresholds match :func:`calculate_oscr` exactly; duplicated
    thresholds merely repeat curve points.

    Returns ``(ccr, fpr, taus)`` device arrays.
    """
    import jax.numpy as jnp

    gt = jnp.asarray(gt).astype(jnp.int32)
    scores = jnp.asarray(scores)
    kn = gt >= 0
    unk = gt == unk_label
    total_kn = jnp.maximum(jnp.sum(kn), 1)
    total_unk = jnp.maximum(jnp.sum(unk), 1)

    num_classes = scores.shape[-1]
    safe = jnp.clip(gt, 0, num_classes - 1)
    target_score = jnp.take_along_axis(scores, safe[:, None], axis=-1)[:, 0]
    pred_ok = (jnp.argmax(scores, axis=-1) == gt) & kn
    max_score = jnp.max(scores, axis=-1)

    # Threshold set: sorted known true-class scores (padding rows pushed to
    # +inf so they never enter the finite prefix).
    taus_all = jnp.sort(jnp.where(kn, target_score, jnp.inf))
    n_kn_rows = jnp.sum(kn)
    if num_thresholds and num_thresholds > 0:
        # Quantiles over the FINITE prefix only (its length is dynamic):
        # fractions of [0, n_kn_rows-1], not of the padded array.
        frac = jnp.linspace(0.0, 1.0, num_thresholds)
        idx = jnp.round(frac * jnp.maximum(n_kn_rows - 1, 0))
        taus = taus_all[idx.astype(jnp.int32)]
    else:
        taus = taus_all

    correct = jnp.sort(jnp.where(pred_ok, target_score, jnp.inf))
    unk_max = jnp.sort(jnp.where(unk, max_score, jnp.inf))
    n_correct = jnp.sum(pred_ok)
    n_unk = jnp.sum(unk)

    # Clamp searchsorted to the finite prefix: at tau == +inf (the padding
    # sentinel) side="right" would also count the +inf padding entries and
    # drive the counts negative.
    cs = jnp.minimum(jnp.searchsorted(correct, taus, side="right"),
                     n_correct)
    us = jnp.minimum(jnp.searchsorted(unk_max, taus, side="right"), n_unk)
    ccr = (n_correct - cs).astype(jnp.float32) / total_kn
    fpr = (n_unk - us).astype(jnp.float32) / total_unk
    return ccr, fpr, taus


def threshold_at_fpr(unknown_measures: np.ndarray,
                     fpr_target: float) -> float:
    """Smallest accept-threshold whose false-positive rate on unknowns is
    ``<= fpr_target``.

    Serving extension (no reference counterpart): operationalizes the
    evaluation's CCR@FPR view (reference ``script/plot_all.py:352-353``)
    for deployment — the returned threshold plugs directly into
    :class:`~openset_imagenet_tpu.inference.OpenSetPredictor`, whose
    convention is *accept iff measure >= threshold* (``inference.py``,
    ``pred = -1 where measure < threshold``).  ``unknown_measures`` are
    the rejection measures of known-to-be-unknown validation samples
    (max-softmax over the known region, or ``||feature|| * max-softmax``
    for objectosphere mode — whichever the predictor will use).

    The smallest qualifying threshold (up to one float32 ulp) is
    returned so known-class acceptance (CCR) is maximal at the chosen
    operating point.  Ties are handled exactly: the count of unknowns
    ``>= threshold`` is guaranteed ``<= floor(fpr_target * n)`` whether
    the comparison happens in float32 (the predictor's measure dtype —
    NumPy's value-based promotion can downcast the scalar) or float64.
    """
    u = np.sort(np.asarray(unknown_measures, dtype=np.float64))
    n = u.size
    if n == 0:
        raise ValueError("no unknown samples to calibrate on")
    if not 0.0 <= fpr_target <= 1.0:
        raise ValueError(f"fpr_target must be in [0, 1], got {fpr_target}")
    k = int(np.floor(fpr_target * n))   # unknowns allowed above threshold
    if k >= n:
        return 0.0                       # accept everything
    # Any threshold <= u[n-k-1] accepts >= k+1 unknowns; just above it
    # accepts exactly count(u > u[n-k-1]) <= k (ties fall below).  One
    # float32 ulp above is strictly greater than the float64 value AND
    # representable in float32, so the guarantee survives the
    # predictor's float32 comparison.
    return float(np.nextafter(np.float32(u[n - k - 1]), np.float32(np.inf)))


def ccr_at_fpr(ccr: np.ndarray, fpr: np.ndarray, query: float,
               max_rel_error: float = 0.10):
    """CCR at the FPR value nearest to ``query``.

    Parity: the nearest-FPR lookup of the reference LaTeX table
    (``script/plot_all.py:344-387``): returns ``None`` when the nearest FPR
    deviates from the query by >= ``max_rel_error`` (the table prints "---").
    """
    fpr = np.asarray(fpr)
    if fpr.size == 0:
        return None
    idx = int(np.abs(fpr - query).argmin())
    error = abs(fpr[idx] - query) / query
    if round(100 * error, 1) >= 100 * max_rel_error:
        return None
    return float(np.asarray(ccr)[idx])
