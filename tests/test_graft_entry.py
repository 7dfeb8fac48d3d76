"""Driver hooks: entry() compile-checks and the multichip DP dry run."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __graft_entry__ as graft  # noqa: E402


def test_entry_abstract_evaluates():
    fn, args = graft.entry()
    logits, features = jax.eval_shape(fn, *args)
    assert logits.shape == (8, 1000)
    assert features.shape == (8, 1000)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)
