"""OSCR tests: the O(N log N) implementation must equal the reference's
O(U*N) loop exactly (reference util.py:90-122), plus table-lookup checks."""

import numpy as np
import pytest

from openset_imagenet_tpu.ops.oscr import (
    calculate_oscr,
    calculate_oscr_reference,
    ccr_at_fpr,
)


def _scores(rng, n, c):
    z = rng.normal(size=(n, c))
    e = np.exp(z - z.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


@pytest.mark.parametrize("unk_label", [-1, -2])
@pytest.mark.parametrize("seed", [0, 1])
def test_fast_oscr_equals_reference_loop(seed, unk_label):
    rng = np.random.default_rng(seed)
    n, c = 300, 10
    scores = _scores(rng, n, c)
    gt = rng.integers(-2, c, size=n)
    ccr_f, fpr_f = calculate_oscr(gt, scores, unk_label)
    ccr_r, fpr_r = calculate_oscr_reference(gt, scores, unk_label)
    np.testing.assert_array_equal(ccr_f, ccr_r)
    np.testing.assert_array_equal(fpr_f, fpr_r)


def test_oscr_with_duplicate_scores():
    """Ties in target scores must be handled identically to the loop."""
    gt = np.array([0, 1, 0, 1, -1, -1, -2])
    scores = np.array([
        [0.9, 0.1], [0.2, 0.8], [0.9, 0.1], [0.8, 0.2],
        [0.6, 0.4], [0.4, 0.6], [0.9, 0.1]])
    for unk in (-1, -2):
        f = calculate_oscr(gt, scores, unk)
        r = calculate_oscr_reference(gt, scores, unk)
        np.testing.assert_array_equal(f[0], r[0])
        np.testing.assert_array_equal(f[1], r[1])


def test_oscr_perfect_separation():
    """A perfectly separable model: CCR stays 1 while FPR drops to 0."""
    gt = np.array([0, 1, -1, -1])
    scores = np.array([[0.99, 0.01], [0.05, 0.95], [0.51, 0.49], [0.5, 0.5]])
    ccr, fpr = calculate_oscr(gt, scores, unk_label=-1)
    # thresholds: unique([0.99, 0.95])[:-1] == [0.95]
    assert len(ccr) == 1
    assert ccr[0] == 0.5  # only the 0.99 sample is above 0.95
    assert fpr[0] == 0.0


def test_ccr_at_fpr_nearest_lookup():
    fpr = np.array([1.0, 0.5, 0.1, 0.01, 0.001])
    ccr = np.array([0.9, 0.8, 0.7, 0.6, 0.5])
    assert ccr_at_fpr(ccr, fpr, 0.01) == 0.6
    assert ccr_at_fpr(ccr, fpr, 1.0) == 0.9
    # nearest to 3e-3 is 1e-3 with ~67% error -> "---"
    assert ccr_at_fpr(ccr, fpr, 3e-3) is None


def test_bg_column_drop_changes_result():
    """Garbage models drop the background column before OSCR
    (reference util.py:186-188)."""
    rng = np.random.default_rng(5)
    scores = _scores(rng, 100, 6)
    gt = rng.integers(-2, 5, size=100)
    full = calculate_oscr(gt, scores, -1)
    dropped = calculate_oscr(gt, scores[:, :-1], -1)
    assert (len(full[0]) != len(dropped[0])
            or not np.array_equal(full[0], dropped[0]))


def test_on_device_oscr_matches_numpy():
    from openset_imagenet_tpu.ops.oscr import calculate_oscr_jax
    import jax

    rng = np.random.default_rng(5)
    n, c = 300, 7
    gt = rng.integers(-2, c, n)
    scores = rng.dirichlet(np.ones(c), size=n)
    ccr_np, fpr_np = calculate_oscr(gt, scores, unk_label=-1)

    f = jax.jit(lambda g, s: calculate_oscr_jax(g, s, unk_label=-1))
    ccr_j, fpr_j, taus = f(gt, scores)
    ccr_j, fpr_j, taus = map(np.asarray, (ccr_j, fpr_j, taus))

    # Values at equal thresholds must agree with the host implementation.
    kn = gt >= 0
    target_score = scores[kn, gt[kn]]
    ref_taus = np.unique(target_score)[:-1]
    for tau in ref_taus[:: max(1, len(ref_taus) // 25)]:
        i_np = np.where(ref_taus == tau)[0][0]
        j = np.where(np.isclose(taus, tau))[0]
        assert j.size > 0
        assert np.isclose(ccr_j[j[0]], ccr_np[i_np])
        assert np.isclose(fpr_j[j[0]], fpr_np[i_np])


def test_on_device_oscr_subsampled_thresholds():
    from openset_imagenet_tpu.ops.oscr import calculate_oscr_jax

    rng = np.random.default_rng(6)
    gt = rng.integers(-1, 4, 100)
    scores = rng.dirichlet(np.ones(4), size=100)
    ccr, fpr, taus = calculate_oscr_jax(gt, scores, num_thresholds=16)
    assert len(np.asarray(ccr)) == 16
    assert np.all(np.diff(np.asarray(fpr)) <= 1e-12)  # FPR non-increasing


def test_on_device_oscr_padding_thresholds_stay_in_range():
    """The +inf padding thresholds (non-known rows) must clamp, not go
    negative — and quantile subsampling must draw from the finite prefix
    only (regression for a searchsorted-past-the-prefix bug)."""
    from openset_imagenet_tpu.ops.oscr import calculate_oscr_jax

    gt = np.array([0, 1, 2, 3, 4, -1, -1, 0, 1, 2, -1, 3], np.int32)
    rng = np.random.default_rng(7)
    scores = rng.dirichlet(np.ones(5), size=len(gt))
    for k in (0, 8, 16):
        ccr, fpr, taus = calculate_oscr_jax(gt, scores, unk_label=-1,
                                            num_thresholds=k)
        ccr, fpr, taus = map(np.asarray, (ccr, fpr, taus))
        assert np.all(ccr >= 0) and np.all(ccr <= 1), (k, ccr)
        assert np.all(fpr >= 0) and np.all(fpr <= 1), (k, fpr)
        if k:
            assert np.all(np.isfinite(taus)), (k, taus)


def test_zero_unknowns_fpr_defined_zero_and_table_dashes():
    """Documented divergence (ops/oscr.py): with zero unknown samples the
    reference computes FPR = 0/0 = NaN (util.py:118); here FPR is 0.  The
    downstream CCR@FPR table lookup then reports "---" (no FPR near any
    query point), never a NaN-driven arbitrary index."""
    from openset_imagenet_tpu.ops.oscr import calculate_oscr, ccr_at_fpr

    rng = np.random.default_rng(0)
    gt = rng.integers(0, 5, 64)  # knowns only, no -1/-2 rows
    scores = rng.dirichlet(np.ones(5), 64)
    ccr, fpr = calculate_oscr(gt, scores, unk_label=-2)
    assert len(fpr) and not np.isnan(fpr).any()
    np.testing.assert_array_equal(fpr, 0.0)
    for q in (1e-3, 1e-2, 0.1, 1.0):
        assert ccr_at_fpr(ccr, fpr, q) is None


def test_threshold_at_fpr_basic_and_minimal():
    from openset_imagenet_tpu.ops.oscr import threshold_at_fpr

    u = np.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0])
    # 20% FPR allows 2 unknowns above the threshold.
    t = threshold_at_fpr(u, 0.2)
    assert np.mean(u >= t) <= 0.2
    # Minimality (float32 granularity): two float32 ulps below the
    # threshold already violates the target (the boundary value 0.8 is
    # not on the float32 grid, so one ulp of slack can remain).
    two_below = np.nextafter(np.nextafter(np.float32(t),
                                          np.float32(-np.inf)),
                             np.float32(-np.inf))
    assert np.mean(u >= two_below) > 0.2
    assert 0.8 < t <= np.nextafter(np.float32(0.8), np.float32(np.inf))


def test_threshold_at_fpr_edges_and_ties():
    from openset_imagenet_tpu.ops.oscr import threshold_at_fpr

    # FPR 0: threshold just above the max; nothing accepted.
    u = np.array([0.3, 0.7, 0.7, 0.7])
    t0 = threshold_at_fpr(u, 0.0)
    assert np.mean(u >= t0) == 0.0
    # Ties at the cut: count must stay <= floor(target * n), never round
    # up through the tied block (25% of 4 allows exactly 1, but the three
    # tied 0.7s would all pass any threshold <= 0.7).
    t1 = threshold_at_fpr(u, 0.25)
    assert np.sum(u >= t1) <= 1
    # FPR 1: accept everything.
    assert threshold_at_fpr(u, 1.0) == 0.0
    with pytest.raises(ValueError):
        threshold_at_fpr(np.array([]), 0.1)
    with pytest.raises(ValueError):
        threshold_at_fpr(u, 1.5)


def test_threshold_at_fpr_feeds_predictor_convention():
    """float32 measures compared against the float64 threshold keep the
    guarantee (the predictor compares in float32-land)."""
    from openset_imagenet_tpu.ops.oscr import threshold_at_fpr

    rng = np.random.default_rng(3)
    u = rng.uniform(0, 1, 501).astype(np.float32)
    for target in (0.0, 0.01, 0.1, 0.5):
        t = threshold_at_fpr(u, target)
        assert np.mean(u.astype(np.float32) >= t) <= target
