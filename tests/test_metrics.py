"""Confidence-metric parity tests against a direct torch transcription of the
reference formula (reference metrics.py:8-42), across all three loss regimes
(regime parameters from reference train.py:156-163)."""

import numpy as np
import pytest
import torch

from openset_imagenet_tpu.ops.metrics import (
    auc_score_binary,
    confidence,
    confidence_sums,
    loss_regime_params,
    predict_objectosphere,
)


def _torch_confidence(scores, target_labels, offset=0.0, unknown_class=-1,
                      last_valid_class=None):
    """Golden transcription of reference metrics.py:8-42."""
    scores = torch.tensor(scores, dtype=torch.float64)
    target_labels = torch.tensor(target_labels, dtype=torch.long)
    unknown = target_labels == unknown_class
    known = torch.logical_and(target_labels >= 0, ~unknown)
    kn_count = int(known.sum())
    neg_count = int(unknown.sum())
    kn_conf, neg_conf = 0.0, 0.0
    if kn_count:
        kn_conf = float(scores[known, target_labels[known]].sum()) / kn_count
    if neg_count:
        neg_conf = float((1.0 + offset
                          - scores[unknown, :last_valid_class].max(dim=1)[0]
                          ).sum()) / neg_count
    return kn_conf, kn_count, neg_conf, neg_count


def _softmax_rows(rng, n, c):
    z = rng.normal(size=(n, c))
    e = np.exp(z - z.max(axis=1, keepdims=True))
    return (e / e.sum(axis=1, keepdims=True)).astype(np.float32)


@pytest.mark.parametrize("loss_type,c", [("entropic", 8), ("softmax", 8),
                                         ("garbage", 9)])
def test_confidence_matches_reference_all_regimes(loss_type, c):
    rng = np.random.default_rng(0)
    scores = _softmax_rows(rng, 64, c)
    if loss_type == "garbage":
        # garbage: labels 0..C-1 where C-1 is the background class
        labels = rng.integers(0, c, size=64).astype(np.int64)
    else:
        labels = rng.integers(-1, c, size=64).astype(np.int64)
    params = loss_regime_params(loss_type, c)
    got = confidence(scores, labels, **params)
    want = _torch_confidence(scores, labels, **params)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-5)
    assert got[1] == want[1]
    np.testing.assert_allclose(got[2], want[2], rtol=1e-5)
    assert got[3] == want[3]


def test_confidence_streaming_equals_whole_array():
    """Sum of per-batch aggregates == whole-matrix result (engine contract)."""
    rng = np.random.default_rng(1)
    c = 6
    scores = _softmax_rows(rng, 50, c)
    labels = rng.integers(-1, c, size=50).astype(np.int64)
    params = loss_regime_params("entropic", c)

    whole = confidence(scores, labels, **params)

    kn_s = kn_c = neg_s = neg_c = 0.0
    for lo in range(0, 50, 16):
        b_scores = scores[lo:lo + 16]
        b_labels = labels[lo:lo + 16]
        # pad final ragged batch and mask it out
        pad = 16 - len(b_labels)
        mask = np.ones(len(b_labels), np.float32)
        if pad:
            b_scores = np.pad(b_scores, ((0, pad), (0, 0)))
            b_labels = np.pad(b_labels, (0, pad))
            mask = np.pad(mask, (0, pad))
        a, b, c_, d = confidence_sums(b_scores, b_labels, sample_mask=mask,
                                      **params)
        kn_s += float(a); kn_c += float(b); neg_s += float(c_); neg_c += float(d)

    np.testing.assert_allclose(kn_s / kn_c, whole[0], rtol=1e-5)
    assert int(kn_c) == whole[1]
    np.testing.assert_allclose(neg_s / neg_c, whole[2], rtol=1e-5)
    assert int(neg_c) == whole[3]


def test_confidence_empty_groups():
    c = 4
    scores = _softmax_rows(np.random.default_rng(2), 8, c)
    all_known = np.arange(8) % c
    got = confidence(scores, all_known, offset=1 / c)
    assert got[3] == 0 and got[2] == 0.0
    all_neg = np.full(8, -1)
    got = confidence(scores, all_neg, offset=1 / c)
    assert got[1] == 0 and got[0] == 0.0


def test_predict_objectosphere():
    logits = np.array([[4.0, 0.0], [0.1, 0.0]], dtype=np.float32)
    feats = np.array([[3.0, 4.0], [0.03, 0.04]], dtype=np.float32)
    out = np.asarray(predict_objectosphere(logits, feats, threshold=0.5))
    assert out[0, 0] == 0.0          # confident + large norm -> class kept
    assert out[1, 0] == -1.0         # small norm*score -> rejected


def test_auc_score_binary():
    rng = np.random.default_rng(3)
    scores = _softmax_rows(rng, 100, 5)
    labels = rng.integers(-1, 5, size=100)
    auc = auc_score_binary(labels.copy(), scores, unk_class=-1)
    assert 0.0 <= auc <= 1.0
