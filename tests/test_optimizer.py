"""TPU-extension optimizer features (all default-off = reference parity).

Covers build_lr_schedule (warmup / cosine composition) and the
optax.MultiSteps gradient-accumulation wrapper; the default StepLR path
is locked against the torch formula in test_engine.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_imagenet_tpu import train as engine
from openset_imagenet_tpu.config import NameSpace
from tests.test_engine import tiny_cfg, write_protocol_csvs


def opt_ns(**kw):
    base = {"type": "sgd", "lr": 0.1, "decay": 0, "gamma": 1}
    base.update(kw)
    return NameSpace(base)


def test_warmup_ramps_linearly_then_follows_step():
    # 2 warmup epochs x 4 steps; StepLR halves every epoch after that.
    sched = engine.build_lr_schedule(
        opt_ns(warmup_epochs=2, decay=1, gamma=0.5), steps_per_epoch=4)
    got = [float(sched(c)) for c in range(16)]
    ramp = [0.1 * (c + 1) / 8 for c in range(8)]
    np.testing.assert_allclose(got[:8], ramp, rtol=1e-6)
    assert got[7] == pytest.approx(0.1)          # ramp tops out at lr
    # counts 8..15 are epochs 2..3 -> lr * 0.5 ** epoch
    np.testing.assert_allclose(got[8:12], 0.1 * 0.5 ** 2, rtol=1e-6)
    np.testing.assert_allclose(got[12:16], 0.1 * 0.5 ** 3, rtol=1e-6)


def test_cosine_decays_from_peak_to_floor_after_warmup():
    sched = engine.build_lr_schedule(
        opt_ns(schedule="cosine", warmup_epochs=1, min_lr_ratio=0.1),
        steps_per_epoch=10, epochs=5)
    assert float(sched(9)) == pytest.approx(0.1)       # end of ramp
    assert float(sched(10)) == pytest.approx(0.1)      # cosine start=peak
    # midpoint of the 40-step decay: (peak + floor) / 2
    assert float(sched(30)) == pytest.approx((0.1 + 0.01) / 2, rel=1e-5)
    assert float(sched(50)) == pytest.approx(0.01)     # floor
    assert float(sched(99)) == pytest.approx(0.01)     # clamped past end


def test_cosine_needs_epochs_and_unknown_kind_rejected():
    with pytest.raises(ValueError, match="cosine"):
        engine.build_lr_schedule(opt_ns(schedule="cosine"), 10, epochs=0)
    with pytest.raises(ValueError, match="schedule"):
        engine.build_lr_schedule(opt_ns(schedule="linear"), 10, epochs=5)


def test_accumulate_matches_mean_gradient_update():
    """k micro-steps == one step on the mean gradient (optax.MultiSteps)."""
    tx = engine.build_optimizer(opt_ns(accumulate_steps=2),
                                steps_per_epoch=8)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    ga = {"w": jnp.asarray([1.0, 2.0, 3.0])}
    gb = {"w": jnp.asarray([3.0, 0.0, -1.0])}
    up1, state = tx.update(ga, state, params)
    # First micro-step: accumulation only, no parameter movement.
    np.testing.assert_array_equal(np.asarray(up1["w"]), 0.0)
    up2, state = tx.update(gb, state, params)

    ref_tx = engine.build_optimizer(opt_ns(), steps_per_epoch=4)
    ref_state = ref_tx.init(params)
    mean = {"w": (ga["w"] + gb["w"]) / 2}
    ref_up, _ = ref_tx.update(mean, ref_state, params)
    np.testing.assert_allclose(np.asarray(up2["w"]),
                               np.asarray(ref_up["w"]), rtol=1e-6)


def test_accumulate_schedule_counts_updates_not_microsteps():
    """With k=2 and StepLR decay, the LR drop lands after steps_per_epoch
    *updates* (= 2x that many micro-steps): the wrapper divides
    steps_per_epoch by k so epoch boundaries stay aligned."""
    tx = engine.build_optimizer(
        opt_ns(accumulate_steps=2, decay=1, gamma=0.5), steps_per_epoch=4)
    params = {"w": jnp.ones(1)}
    state = tx.init(params)
    g = {"w": jnp.ones(1)}
    seen = []
    for _ in range(8):   # 8 micro-steps = 4 updates = epochs 0,0,1,1
        up, state = tx.update(g, state, params)
        if float(up["w"][0]) != 0.0:
            seen.append(-float(up["w"][0]))
    # SGD momentum buffer over identical unit mean-grads:
    # update_s = lr(epoch(s)) * (1 - 0.9**(s+1)) / 0.1
    expect = [0.1 * 0.5 ** (s // 2) * (1 - 0.9 ** (s + 1)) / 0.1
              for s in range(4)]
    np.testing.assert_allclose(seen, expect, rtol=1e-5)


def test_weight_ema_recurrence_and_extract():
    """EMA follows decay*e + (1-decay)*p per real update; extract_ema
    finds it under chain AND MultiSteps nesting."""
    tx = engine.build_optimizer(opt_ns(ema=0.5, accumulate_steps=2),
                                steps_per_epoch=8)
    params = {"w": jnp.zeros(2)}
    state = tx.init(params)
    assert np.asarray(engine.extract_ema(state)["w"]).tolist() == [0, 0]
    g = {"w": -jnp.ones(2)}   # sgd lr=0.1 -> params move +0.1/update
    for i in range(4):        # 4 micro-steps = 2 real updates
        up, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, up)
    # updates: sgd momentum buffer over unit mean-grads
    # p1 = 0.1*1.0; p2 = p1 + 0.1*1.9
    p1, p2 = 0.1, 0.1 + 0.19
    ema = 0.5 * (0.5 * 0.0 + 0.5 * p1) + 0.5 * p2
    np.testing.assert_allclose(np.asarray(engine.extract_ema(state)["w"]),
                               ema, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["w"]), p2, rtol=1e-6)


def test_extract_ema_none_without_ema():
    tx = engine.build_optimizer(opt_ns(), steps_per_epoch=4)
    assert engine.extract_ema(tx.init({"w": jnp.ones(1)})) is None


def test_build_optimizer_rejects_bad_ema():
    with pytest.raises(ValueError, match="ema"):
        engine.build_optimizer(opt_ns(ema=1.5), steps_per_epoch=4)


@pytest.mark.slow
def test_worker_ema_best_checkpoint_holds_smoothed_weights(tmp_path):
    """With opt.ema on: _curr stores the raw params (exact resume) and
    _best stores the EMA params == extract_ema of _curr's opt_state."""
    from openset_imagenet_tpu.checkpoint import load_checkpoint
    from openset_imagenet_tpu.models.resnet import build_resnet

    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "softmax", epochs=1)
    cfg.opt = NameSpace({"type": "adam", "lr": 1e-3, "decay": 0,
                         "gamma": 1, "ema": 0.9})
    engine.worker(cfg)
    model = build_resnet("tiny", fc_layer_dim=3, out_features=3)
    tx = engine.build_optimizer(cfg.opt, 1)
    template = engine.create_state(model, jax.random.PRNGKey(0), tx,
                                   image_size=32)
    curr, _, _ = load_checkpoint(
        cfg.output_directory / "softmax_curr.pth", template)
    best, _, _ = load_checkpoint(
        cfg.output_directory / "softmax_best.pth", template)
    ema = engine.extract_ema(curr.opt_state)
    flat_best = jax.tree_util.tree_leaves(best.params)
    flat_ema = jax.tree_util.tree_leaves(ema)
    flat_raw = jax.tree_util.tree_leaves(curr.params)
    for b, e in zip(flat_best, flat_ema):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(e))
    assert any(not np.array_equal(np.asarray(b), np.asarray(r))
               for b, r in zip(flat_best, flat_raw))


@pytest.mark.slow
def test_worker_trains_with_accumulation_and_cosine(tmp_path):
    """End-to-end: the training worker runs with both extensions on."""
    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "softmax", epochs=2)
    cfg.opt = NameSpace({"type": "adam", "lr": 1e-3, "decay": 0,
                         "gamma": 1, "schedule": "cosine",
                         "warmup_epochs": 1, "accumulate_steps": 2})
    engine.worker(cfg)
    assert (cfg.output_directory / "softmax_curr.pth").exists()
