"""Property-based fuzzing of the parity-critical math (hypothesis).

SURVEY.md flags the confidence/OSCR regime rules as the highest
parity-risk code; these properties fuzz them against the reference-loop
implementations and invariants over arbitrary inputs.
"""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from openset_imagenet_tpu.ops.losses import (entropic_openset_loss,  # noqa
                                             softmax_loss)
from openset_imagenet_tpu.ops.metrics import confidence, confidence_sums  # noqa
from openset_imagenet_tpu.ops.oscr import (calculate_oscr,  # noqa
                                           calculate_oscr_reference)


@st.composite
def score_problem(draw, max_n=40, max_c=6):
    n = draw(st.integers(2, max_n))
    c = draw(st.integers(2, max_c))
    seed = draw(st.integers(0, 2 ** 31 - 1))
    rng = np.random.default_rng(seed)
    gt = rng.integers(-2, c, n)
    if not (gt >= 0).any():
        gt[0] = 0  # at least one known
    scores = rng.dirichlet(np.ones(c), size=n)
    return gt, scores


@settings(max_examples=60, deadline=None)
@given(score_problem())
def test_fast_oscr_always_equals_reference_loop(problem):
    gt, scores = problem
    for unk in (-1, -2):
        ccr_f, fpr_f = calculate_oscr(gt, scores, unk_label=unk)
        if not (gt == unk).any():
            # Zero unknowns: reference yields NaN (0/0); we define FPR=0.
            assert np.all(fpr_f == 0)
            continue
        ccr_r, fpr_r = calculate_oscr_reference(gt, scores, unk_label=unk)
        np.testing.assert_allclose(ccr_f, ccr_r, atol=1e-12)
        np.testing.assert_allclose(fpr_f, fpr_r, atol=1e-12)
        # Monotonicity: CCR and FPR never increase as tau grows.
        assert np.all(np.diff(ccr_f) <= 1e-12)
        assert np.all(np.diff(fpr_f) <= 1e-12)


@settings(max_examples=40, deadline=None)
@given(score_problem(max_n=24, max_c=5),
       st.integers(0, 2 ** 31 - 1))
def test_losses_are_padding_invariant(problem, pad_seed):
    gt, scores = problem
    logits = np.log(scores + 1e-9).astype(np.float32)
    n = len(gt)
    rng = np.random.default_rng(pad_seed)
    pad = int(rng.integers(1, 8))
    logits_p = np.concatenate(
        [logits, rng.normal(size=(pad, logits.shape[1])).astype(np.float32)])
    gt_p = np.concatenate([gt, rng.integers(-2, logits.shape[1], pad)])
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])

    for fn in (entropic_openset_loss, softmax_loss):
        base = fn(jnp.asarray(logits), jnp.asarray(gt))
        padded = fn(jnp.asarray(logits_p), jnp.asarray(gt_p),
                    sample_mask=jnp.asarray(mask))
        if float(base[1]) == 0:
            continue  # no valid rows (softmax with all-negative labels)
        np.testing.assert_allclose(float(padded[0]), float(base[0]),
                                   rtol=1e-5)
        assert float(padded[1]) == float(base[1])


@settings(max_examples=40, deadline=None)
@given(score_problem(max_n=30, max_c=5), st.integers(1, 5))
def test_confidence_streaming_equals_whole_array(problem, n_chunks):
    gt, scores = problem
    c = scores.shape[1]
    whole = confidence(scores, gt, offset=1.0 / c, unknown_class=-1)
    sums = np.zeros(4)
    for chunk_gt, chunk_s in zip(np.array_split(gt, n_chunks),
                                 np.array_split(scores, n_chunks)):
        if len(chunk_gt) == 0:
            continue
        out = confidence_sums(jnp.asarray(chunk_s), jnp.asarray(chunk_gt),
                              offset=1.0 / c, unknown_class=-1)
        sums += np.array([float(x) for x in out])
    kn = sums[0] / sums[1] if sums[1] else 0.0
    neg = sums[2] / sums[3] if sums[3] else 0.0
    assert kn == pytest.approx(whole[0], abs=1e-5)
    assert neg == pytest.approx(whole[2], abs=1e-5)
    assert int(sums[1]) == whole[1] and int(sums[3]) == whole[3]
