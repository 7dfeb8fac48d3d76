"""Loss parity tests: JAX losses vs torch-CPU golden implementations.

The golden values reproduce the exact torch criteria the reference wires up
(reference train.py:330-347): EntropicOpensetLoss soft-target CE,
CrossEntropyLoss(ignore_index=-1), and weighted CrossEntropyLoss.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from openset_imagenet_tpu.ops.losses import (
    AverageMeter,
    EarlyStopping,
    entropic_openset_loss,
    garbage_loss,
    softmax_loss,
)


def _torch_entropic(logits, labels, num_classes, w=1.0):
    """Golden: reference losses.py:16-29 semantics."""
    logits_t = torch.tensor(logits, dtype=torch.float64)
    labels_t = torch.tensor(labels)
    targets = torch.zeros_like(logits_t)
    unk = labels_t < 0
    kn = ~unk
    eye = torch.eye(num_classes, dtype=torch.float64)
    if kn.any():
        targets[kn] = eye[labels_t[kn]]
    targets[unk] = w / num_classes
    return F.cross_entropy(logits_t, targets).item()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_entropic_matches_torch(seed):
    rng = np.random.default_rng(seed)
    C = 7
    logits = rng.normal(size=(32, C)).astype(np.float32)
    labels = rng.integers(-1, C, size=32).astype(np.int32)
    got, count = entropic_openset_loss(logits, labels, unk_weight=1.0)
    want = _torch_entropic(logits, labels, C, w=1.0)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    assert float(count) == 32


def test_entropic_unk_weight():
    rng = np.random.default_rng(3)
    C = 5
    logits = rng.normal(size=(16, C)).astype(np.float32)
    labels = np.full(16, -1, dtype=np.int32)
    got, _ = entropic_openset_loss(logits, labels, unk_weight=2.5)
    want = _torch_entropic(logits, labels, C, w=2.5)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_entropic_all_known_and_all_unknown():
    rng = np.random.default_rng(4)
    C = 4
    logits = rng.normal(size=(8, C)).astype(np.float32)
    for labels in [rng.integers(0, C, 8), np.full(8, -1)]:
        labels = labels.astype(np.int32)
        got, _ = entropic_openset_loss(logits, labels)
        want = _torch_entropic(logits, labels, C)
        np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_entropic_uniform_target_of_zero_logits_is_log_c():
    """Invariant from SURVEY §4: uniform-target CE of zero logits == log C."""
    C = 10
    logits = np.zeros((4, C), dtype=np.float32)
    labels = np.full(4, -1, dtype=np.int32)
    got, _ = entropic_openset_loss(logits, labels)
    np.testing.assert_allclose(float(got), np.log(C), rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 5])
def test_softmax_ignore_index_matches_torch(seed):
    rng = np.random.default_rng(seed)
    C = 6
    logits = rng.normal(size=(20, C)).astype(np.float32)
    labels = rng.integers(-1, C, size=20).astype(np.int32)
    got, count = softmax_loss(logits, labels)
    want = F.cross_entropy(
        torch.tensor(logits, dtype=torch.float64),
        torch.tensor(labels, dtype=torch.long), ignore_index=-1).item()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    assert float(count) == (labels >= 0).sum()


@pytest.mark.parametrize("seed", [0, 7])
def test_garbage_weighted_ce_matches_torch(seed):
    rng = np.random.default_rng(seed)
    C = 5  # includes background class C-1
    logits = rng.normal(size=(24, C)).astype(np.float32)
    labels = rng.integers(0, C, size=24).astype(np.int32)
    weights = rng.uniform(0.5, 2.0, size=C).astype(np.float32)
    got, wsum = garbage_loss(logits, labels, weights)
    want = F.cross_entropy(
        torch.tensor(logits, dtype=torch.float64),
        torch.tensor(labels, dtype=torch.long),
        weight=torch.tensor(weights, dtype=torch.float64)).item()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    np.testing.assert_allclose(float(wsum), weights[labels].sum(), rtol=1e-5)


def test_sample_mask_excludes_padding():
    """Padded rows must not change the mean — ragged final batch contract."""
    rng = np.random.default_rng(9)
    C = 4
    logits = rng.normal(size=(8, C)).astype(np.float32)
    labels = rng.integers(-1, C, size=8).astype(np.int32)
    pad_logits = np.concatenate([logits, rng.normal(size=(4, C)).astype(np.float32)])
    pad_labels = np.concatenate([labels, rng.integers(0, C, 4).astype(np.int32)])
    mask = np.array([1.0] * 8 + [0.0] * 4, dtype=np.float32)

    for fn in (entropic_openset_loss, softmax_loss):
        full, _ = fn(logits, labels)
        padded, _ = fn(pad_logits, pad_labels, sample_mask=mask)
        np.testing.assert_allclose(float(full), float(padded), rtol=1e-6)

    w = rng.uniform(0.5, 2.0, size=C).astype(np.float32)
    g_labels = np.abs(labels)
    g_pad_labels = np.concatenate([g_labels, pad_labels[8:]])
    full, _ = garbage_loss(logits, g_labels, w)
    padded, _ = garbage_loss(pad_logits, g_pad_labels, w, sample_mask=mask)
    np.testing.assert_allclose(float(full), float(padded), rtol=1e-6)


def test_average_meter():
    m = AverageMeter()
    m.update(2.0, 4)
    m.update(4.0, 4)
    assert m.avg == 3.0
    assert m.count == 8
    m.reset()
    assert m.avg == 0 and m.sum == 0


def test_early_stopping_metric_mode():
    es = EarlyStopping(patience=2)
    es(0.5, loss=False)  # best
    es(0.4, loss=False)  # worse x1
    assert not es.early_stop
    es(0.4, loss=False)  # worse x2 -> stop
    assert es.early_stop


def test_early_stopping_resets_on_improvement():
    es = EarlyStopping(patience=2)
    es(0.5, loss=False)
    es(0.4, loss=False)
    es(0.6, loss=False)  # improvement resets counter
    es(0.5, loss=False)
    assert not es.early_stop


def test_entropic_class_adapter_matches_functional():
    """Reference API parity: EntropicOpensetLoss(num, w)(logits, target)
    == the functional mean (reference losses.py:7-29)."""
    import numpy as np

    from openset_imagenet_tpu.losses import (EntropicOpensetLoss,
                                             entropic_openset_loss)

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    target = rng.integers(-1, 5, 16).astype(np.int32)
    loss_obj = EntropicOpensetLoss(5, unk_weight=0.7)
    mean, _ = entropic_openset_loss(logits, target, unk_weight=0.7)
    assert float(loss_obj(logits, target)) == float(mean)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="classes"):
        EntropicOpensetLoss(4)(logits, target)
