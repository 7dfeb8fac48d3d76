"""Step-granular (mid-epoch) checkpoint/resume.

TPU extension beyond the reference's epoch-boundary checkpoints (reference
``train.py:372-388, 462-471``): a preemption or step budget can stop a run
*inside* an epoch, save ``_curr`` with ``extra.progress = {epoch,
next_batch}``, and the resumed run retraces the uninterrupted one bitwise.
The guarantee rests on the pipeline being a pure function of
``(seed, epoch, global index)`` (shuffle order AND per-sample augmentation),
so the suffix of an epoch is reproducible without replaying its prefix.

Locks:

* ``InputPipeline.epoch(e, start_batch=k)`` yields exactly the suffix of the
  full iteration, bitwise.
* train_epoch-level: full run == (prefix, save, load, suffix), bitwise on
  params / batch_stats / opt_state.
* worker-level: ``max_steps`` stops mid-epoch with a progress checkpoint and
  the resumed run's final state is bitwise-identical to a straight run.
* worker-level: SIGTERM in ``preempt_mode: step`` exits with a resumable
  checkpoint (mid-epoch or boundary, whichever the signal's timing hits).
"""

import os
import signal
import threading
import time
from pathlib import Path

import jax
import numpy as np
import pytest

from openset_imagenet_tpu import train as engine
from openset_imagenet_tpu.checkpoint import (load_checkpoint, read_metadata,
                                             save_checkpoint)
from openset_imagenet_tpu.pipeline import InputPipeline, SyntheticReader
from tests.test_engine import tiny_cfg, write_protocol_csvs


def _tiny_pipeline(n=29, batch=8, seed=7):
    paths = [f"img_{i}" for i in range(n)]
    labels = np.arange(n) % 3
    return InputPipeline(paths, labels, batch, is_training=True, seed=seed,
                         num_workers=2, reader=SyntheticReader(crop=32))


def test_pipeline_start_batch_yields_identical_suffix():
    pipe = _tiny_pipeline()
    full = list(pipe.epoch(3))
    for k in (0, 1, 2, len(full)):
        suffix = list(pipe.epoch(3, start_batch=k))
        assert len(suffix) == len(full) - k
        for a, b in zip(full[k:], suffix):
            np.testing.assert_array_equal(np.asarray(a.images),
                                          np.asarray(b.images))
            np.testing.assert_array_equal(np.asarray(a.labels),
                                          np.asarray(b.labels))
            np.testing.assert_array_equal(np.asarray(a.mask),
                                          np.asarray(b.mask))
    pipe.close()


def test_pipeline_start_batch_out_of_range():
    pipe = _tiny_pipeline()
    with pytest.raises(ValueError, match="start_batch"):
        next(iter(pipe.epoch(0, start_batch=len(pipe) + 1)))
    with pytest.raises(ValueError, match="start_batch"):
        next(iter(pipe.epoch(0, start_batch=-1)))
    pipe.close()


def _state_leaves(state):
    return [np.asarray(x) for x in jax.tree.leaves(
        (state.params, state.batch_stats, state.opt_state, state.step))]


def _assert_states_equal(a, b):
    la, lb = _state_leaves(a), _state_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(x, y)


def test_train_epoch_midpoint_save_resume_is_bitwise(tmp_path):
    """(k steps, save, load, resume at k) == one uninterrupted epoch."""
    from openset_imagenet_tpu.models.resnet import build_resnet

    pipe = _tiny_pipeline(n=24, batch=8)
    model = build_resnet("tiny", fc_layer_dim=3, out_features=3,
                         logit_bias=False)
    tx = engine.build_optimizer(
        engine_opt_cfg(), steps_per_epoch=len(pipe))
    loss_fn = engine.make_loss_fn("softmax")
    step = engine.make_train_step(loss_fn)
    trackers = {"j": engine.AverageMeter(), "imgs/s": engine.AverageMeter()}

    def fresh():
        return engine.create_state(model, jax.random.PRNGKey(0), tx,
                                   image_size=32)

    straight = engine.train_epoch(fresh(), pipe, 0, step, trackers)

    k = 2
    stopper = lambda st, done: done == k
    prefix = engine.train_epoch(fresh(), pipe, 0, step, trackers,
                                step_hook=stopper)
    ckpt = tmp_path / "mid.pth"
    save_checkpoint(ckpt, prefix, 0, 0.0,
                    extra={"progress": {"epoch": 0, "next_batch": k}})
    loaded, _, _ = load_checkpoint(ckpt, fresh(), restore_opt=True)
    resumed = engine.train_epoch(loaded, pipe, 0, step, trackers,
                                 start_batch=k)
    _assert_states_equal(straight, resumed)
    pipe.close()


def engine_opt_cfg():
    from openset_imagenet_tpu.config import NameSpace
    return NameSpace({"type": "adam", "lr": 1e-3, "decay": 0, "gamma": 1})


def test_worker_max_steps_stops_midepoch_and_resume_is_bitwise(tmp_path):
    """Step budget -> mid-epoch progress checkpoint -> bitwise resume.

    Straight run: 2 epochs.  Interrupted run: max_steps lands inside
    epoch 1, the worker saves ``_curr`` with progress and exits; a second
    worker resumes from it and finishes epoch 1 (and nothing else changes).
    Final parameters must match the straight run exactly.
    """
    from flax import serialization

    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "entropic", epochs=2)
    cfg.output_directory = Path(tmp_path / "straight")
    engine.worker(cfg)

    # 37 train samples (32 + 5 guaranteed-coverage rows), batch 8 -> 5
    # batches/epoch; budget 7 = full epoch 0 + 2 steps of epoch 1.
    cfg1 = tiny_cfg(tmp_path, "entropic", epochs=2, max_steps=7)
    cfg1.output_directory = Path(tmp_path / "resumed")
    info1 = engine.worker(cfg1)
    assert info1["stopped_mid_epoch"] == 2
    curr = Path(cfg1.output_directory) / "entropic_curr.pth"
    meta = read_metadata(curr)
    assert meta["extra"]["progress"] == {"epoch": 1, "next_batch": 2}

    cfg2 = tiny_cfg(tmp_path, "entropic", epochs=2)
    cfg2.output_directory = Path(tmp_path / "resumed")
    cfg2.checkpoint = str(curr)
    info2 = engine.worker(cfg2)
    assert info2["stopped_mid_epoch"] is None
    # The resumed run completed epoch 1 and its boundary checkpoint
    # cleared the progress marker.
    meta2 = read_metadata(curr)
    assert meta2["epoch"] == 2
    assert "progress" not in (meta2.get("extra") or {})

    def read_state(path):
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        return payload

    a = read_state(Path(tmp_path / "straight") / "entropic_curr.pth")
    b = read_state(Path(tmp_path / "resumed") / "entropic_curr.pth")
    for section in ("model_state_dict", "batch_stats", "opt_state_dict"):
        la, lb = jax.tree.leaves(a[section]), jax.tree.leaves(b[section])
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert a["step"] == b["step"]


def test_worker_max_steps_at_epoch_boundary(tmp_path):
    """A budget that ends exactly at a boundary behaves like fewer epochs."""
    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "entropic", epochs=3, max_steps=5)  # = 1 epoch
    info = engine.worker(cfg)
    assert info["stopped_mid_epoch"] is None
    assert info["last_epoch"] == 0
    meta = read_metadata(Path(cfg.output_directory) / "entropic_curr.pth")
    assert meta["epoch"] == 1
    assert "progress" not in (meta.get("extra") or {})


def test_worker_checkpoint_every_steps_writes_progress(tmp_path):
    """Periodic mid-epoch saves carry progress; the boundary save clears it.

    max_steps pins the run mid-epoch so the last write IS a periodic one.
    """
    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "entropic", epochs=1, max_steps=4,
                   checkpoint_every_steps=2)
    engine.worker(cfg)
    meta = read_metadata(Path(cfg.output_directory) / "entropic_curr.pth")
    assert meta["extra"]["progress"] == {"epoch": 0, "next_batch": 4}


def test_worker_sigterm_step_mode_saves_resumable_checkpoint(tmp_path):
    """preempt_mode=step: SIGTERM exits promptly with a resumable _curr.

    The signal's arrival step is timing-dependent, so the assertion is on
    the contract: the checkpoint (mid-epoch or boundary) resumes cleanly
    and training continues from where it stopped.
    """
    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "entropic", epochs=200, preempt_mode="step",
                   preempt_check_steps=1)
    curr = Path(cfg.output_directory) / "entropic_curr.pth"

    def fire_when_started():
        # Never fire blind (a stray SIGTERM after the worker restored the
        # default handler would kill pytest) — wait for the first write.
        for _ in range(600):
            if curr.exists():
                os.kill(os.getpid(), signal.SIGTERM)
                return
            time.sleep(0.05)

    t = threading.Thread(target=fire_when_started, daemon=True)
    t.start()
    info = engine.worker(cfg)
    t.join(timeout=60)
    meta = read_metadata(curr)
    assert meta["epoch"] < 200
    prog = (meta.get("extra") or {}).get("progress")
    if info["stopped_mid_epoch"] is not None:
        assert prog == {"epoch": info["last_epoch"],
                        "next_batch": info["stopped_mid_epoch"]}
    # Resume must run regardless of where the signal landed.
    epochs2 = (prog["epoch"] if prog else meta["epoch"]) + 1
    cfg2 = tiny_cfg(tmp_path, "entropic", epochs=epochs2)
    cfg2.checkpoint = str(curr)
    info2 = engine.worker(cfg2)
    assert info2["stopped_mid_epoch"] is None
    assert read_metadata(curr)["epoch"] == epochs2


def test_resume_rejects_changed_batch_geometry(tmp_path, monkeypatch):
    """A progress checkpoint is only valid for the geometry it was cut on.

    The rejection must also release the already-built pipelines' decode
    thread pools (the resume block raises before the worker's main
    try/finally is entered).
    """
    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "entropic", epochs=2, max_steps=7)
    engine.worker(cfg)
    curr = Path(cfg.output_directory) / "entropic_curr.pth"
    cfg2 = tiny_cfg(tmp_path, "entropic", epochs=2, batch_size=37)
    cfg2.checkpoint = str(curr)
    built = []
    real = engine.pipeline_from_dataset

    def spy(*args, **kwargs):
        pipe = real(*args, **kwargs)
        built.append(pipe)
        return pipe

    monkeypatch.setattr(engine, "pipeline_from_dataset", spy)
    with pytest.raises(ValueError, match="batches/epoch"):
        engine.worker(cfg2)
    assert len(built) == 2
    assert all(p._pool._shutdown for p in built)


def test_midepoch_checkpoint_epoch_field_counts_completed_epochs(tmp_path):
    """A mid-epoch _curr's `epoch` payload field stays truthful.

    `epoch` is "completed epochs" (doubling as the resume start for
    progress-UNAWARE consumers: finetune, torch export, the plot layer).
    A cut inside epoch 1 must store 1, not 2 — otherwise those consumers
    silently skip the untrained remainder of the interrupted epoch.
    """
    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "entropic", epochs=2, max_steps=7)
    engine.worker(cfg)  # 5 batches/epoch: stops at epoch 1, batch 2
    meta = read_metadata(Path(cfg.output_directory) / "entropic_curr.pth")
    assert meta["extra"]["progress"] == {"epoch": 1, "next_batch": 2}
    assert meta["epoch"] == 1


def test_resume_with_exhausted_budget_trains_nothing(tmp_path):
    """Resuming a max_steps-exhausted run with the budget still set must
    not train one more step per restart, nor overwrite the checkpoint it
    resumed from."""
    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "entropic", epochs=2, max_steps=7)
    info = engine.worker(cfg)
    assert info["stopped_mid_epoch"] == 2
    curr = Path(cfg.output_directory) / "entropic_curr.pth"
    before = curr.read_bytes()

    cfg2 = tiny_cfg(tmp_path, "entropic", epochs=2, max_steps=7)
    cfg2.checkpoint = str(curr)
    info2 = engine.worker(cfg2)
    # Same reported stopping point as the budget-hitting run...
    assert info2["stopped_mid_epoch"] == 2
    assert info2["last_epoch"] == info["last_epoch"]
    # ...and the checkpoint is untouched (zero steps were trained).
    assert curr.read_bytes() == before
