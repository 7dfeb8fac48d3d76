"""Statistical lock on the three-loss unknown-rejection result.

The paper's headline qualitative claim (reference ``plot_all.py:344-387``
report table; BENCH.md round-3 drive) is that the entropic open-set loss
rejects unknowns best.  The drive witnessed it once; this test repeats
the evaluation over 5 seeds at a CPU-feasible operating point and asserts
the claim statistically (VERDICT round-3 #6): paired 95% t interval for
EOS > softmax, exact one-sided sign test (p = 2^-5 ~ 0.03) for
EOS > garbage.

The task mirrors the protocol's CLASS structure (known / negative /
unseen-unknown classes all drawn from one color-prototype family,
SURVEY.md §1 P1 ratios) and trains through the production engine
factories with per-loss label surgery (reference train.py:270-293).

The paper's FULL ordering EOS > S > BG does NOT reproduce at synthetic
scale: with prototype classes, both negative-trained losses beat
negative-blind softmax (garbage sits between EOS and S) — the S > BG
tail is a real-ImageNet property, recorded as data-gated in BENCH.md
round 4.  Asserting it here would lock a falsehood.
"""

import importlib.util
import json
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "bench_loss_ordering", os.path.join(_REPO, "bench_loss_ordering.py"))
study = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(study)


@pytest.mark.slow
def test_entropic_rejects_unknowns_best():
    results, summary = study.run_study("tiny", seeds=5)

    # Every arm must have learned the (trivially separable) known task —
    # otherwise the rejection comparison is vacuous.
    for r in results:
        assert r["known_acc"] > 0.9, r

    pairs = summary["pairs"]
    # Paired-by-seed evidence that EOS rejects unknowns better than BOTH
    # baselines (CI or exact sign test, see summarize()).
    assert summary["eos_best"], json.dumps(summary, indent=2)
    # Effect direction is unanimous across seeds for both comparisons.
    assert pairs["entropic_gt_softmax"]["wins"] == 5, pairs
    assert pairs["entropic_gt_garbage"]["wins"] == 5, pairs
    # And the mean effect is not a numerical whisker.
    assert pairs["entropic_gt_softmax"]["mean_diff"] > 0.02, pairs
    assert pairs["entropic_gt_garbage"]["mean_diff"] > 0.02, pairs
