"""ZeRO-1 optimizer-state sharding (``opt.zero1``) on the 8-device mesh.

TPU extension beyond the reference's inventory (the reference's
vestigial DDP import, reference ``train.py:10``, replicates everything):
``make_state_shardings(zero1=True)`` partitions the optimizer state over
the ``data`` axis via GSPMD sharding annotations — Adam moments, the EMA
shadow and accumulation buffers live once across the mesh instead of
once per device, and XLA places the matching collectives over ICI.

Locks:
* training-math equivalence with the replicated path (same update is a
  pure re-layout of the same computation),
* the actual partitioning (per-device optimizer bytes shrink ~N×),
* checkpoint round-trip (save gathers, resume re-places into shards),
* config surface errors for the unsupported combinations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openset_imagenet_tpu import train as engine
from openset_imagenet_tpu.config import NameSpace
from openset_imagenet_tpu.models.resnet import build_resnet
from openset_imagenet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                replicated, shard_over_axis)


def build_state(ema=0.0, accumulate=1):
    model = build_resnet("tiny", fc_layer_dim=4, out_features=4)
    opt = {"type": "adam", "lr": 0.01, "decay": 0, "gamma": 1}
    if ema:
        opt["ema"] = ema
    if accumulate > 1:
        opt["accumulate_steps"] = accumulate
    tx = engine.build_optimizer(NameSpace(opt), 1)
    return engine.create_state(model, jax.random.PRNGKey(0), tx,
                               image_size=32)


def batch_on(mesh, n=16, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (n, 32, 32, 3), np.uint8)
    labels = rng.integers(-1, 4, n).astype(np.int32)
    mask = np.ones(n, np.float32)
    data = batch_sharding(mesh)
    return tuple(jax.device_put(x, data) for x in (images, labels, mask))


def run_steps(mesh, zero1, steps=3, **build_kw):
    loss_fn = engine.make_loss_fn("entropic")
    batch = batch_on(mesh)
    state = build_state(**build_kw)
    sh = engine.make_state_shardings(state, mesh, zero1=zero1)
    state = jax.device_put(state, sh)
    step = engine.make_train_step(loss_fn, mesh, state_sharding=sh)
    metrics = None
    for _ in range(steps):
        state, metrics = step(state, *batch)
    return state, metrics


def per_device_bytes(tree):
    total = 0
    for x in jax.tree.leaves(tree):
        if hasattr(x, "addressable_shards"):
            total += x.addressable_shards[0].data.nbytes
    return total


def test_zero1_matches_replicated_training():
    """Three Adam+EMA steps: sharded optimizer state is a pure re-layout —
    parameters and loss must match the replicated path to float precision."""
    mesh = make_mesh(8)
    s_rep, m_rep = run_steps(mesh, zero1=False, ema=0.99)
    s_z1, m_z1 = run_steps(mesh, zero1=True, ema=0.99)
    assert float(m_rep["loss_sum"]) == pytest.approx(
        float(m_z1["loss_sum"]), rel=1e-6)
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, s_rep.params)),
                    jax.tree.leaves(jax.tree.map(np.asarray, s_z1.params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # The EMA shadow (inside opt_state) must agree too.
    e_rep = engine.extract_ema(s_rep.opt_state)
    e_z1 = engine.extract_ema(s_z1.opt_state)
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, e_rep)),
                    jax.tree.leaves(jax.tree.map(np.asarray, e_z1))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_zero1_actually_partitions_optimizer_state():
    mesh = make_mesh(8)
    s_rep, _ = run_steps(mesh, zero1=False, steps=1, ema=0.99)
    s_z1, _ = run_steps(mesh, zero1=True, steps=1, ema=0.99)
    rep_bytes = per_device_bytes(s_rep.opt_state)
    z1_bytes = per_device_bytes(s_z1.opt_state)
    # tiny-model channel dims are all multiples of 8 except a handful of
    # scalars/odd shapes; expect at least a 4x per-device shrink (ideal 8x).
    assert z1_bytes < rep_bytes / 4, (z1_bytes, rep_bytes)
    # Params/batch_stats stay replicated: forward math untouched.
    for leaf in jax.tree.leaves(s_z1.params):
        assert leaf.sharding.is_fully_replicated
    # At least one Adam moment leaf is genuinely sharded over `data`.
    sharded = [x for x in jax.tree.leaves(s_z1.opt_state)
               if hasattr(x, "sharding") and not x.sharding.is_fully_replicated]
    assert sharded, "no sharded optimizer leaves"
    shard = sharded[0].addressable_shards[0].data
    assert shard.size * 8 == sharded[0].size


def test_shard_over_axis_leaf_rules():
    mesh = make_mesh(8)
    tree = {
        "scalar": jnp.zeros(()),
        "odd": jnp.zeros((3, 5)),          # nothing divisible by 8
        "dim0": jnp.zeros((16, 3)),        # shard dim 0
        "later_dim": jnp.zeros((3, 3, 64, 4)),  # first divisible is dim 2
    }
    sh = shard_over_axis(mesh, tree)
    assert sh["scalar"] == replicated(mesh)
    assert sh["odd"] == replicated(mesh)
    assert tuple(sh["dim0"].spec) == ("data", None)
    assert tuple(sh["later_dim"].spec) == (None, None, "data", None)


def test_zero1_checkpoint_roundtrip_bitwise():
    """Save gathers the sharded state to host; resume re-places it into
    shards — the round trip must be bitwise."""
    from openset_imagenet_tpu.checkpoint import (load_checkpoint,
                                                 save_checkpoint)
    mesh = make_mesh(8)
    state, _ = run_steps(mesh, zero1=True, steps=2, ema=0.99)
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        f = pathlib.Path(d) / "z1_curr.pth"
        save_checkpoint(str(f), state, 1, 0.5)
        fresh = build_state(ema=0.99)
        sh = engine.make_state_shardings(fresh, mesh, zero1=True)
        fresh = jax.device_put(fresh, sh)
        restored, epoch, score = load_checkpoint(str(f), fresh,
                                                 restore_opt=True)
        restored = jax.device_put(restored, sh)
    assert epoch == 2 and score == 0.5  # save stores epoch + 1
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, state.opt_state)),
                    jax.tree.leaves(jax.tree.map(np.asarray,
                                                 restored.opt_state))):
        np.testing.assert_array_equal(a, b)


def test_worker_end_to_end_with_zero1(tmp_path):
    """Full worker run with opt.zero1 on the 8-device mesh: trains, saves,
    and lands on the same parameters as the replicated run (same seed,
    same data order — the sharding is a pure re-layout)."""
    from flax import serialization
    from test_engine import tiny_cfg, write_protocol_csvs

    write_protocol_csvs(tmp_path)

    def run(zero1, name):
        cfg = tiny_cfg(tmp_path, "entropic", epochs=1)
        cfg.name = name
        cfg.opt.zero1 = zero1
        cfg.output_directory = tmp_path / f"out_{name}"
        engine.worker(cfg)
        with open(tmp_path / f"out_{name}" / f"{name}_curr.pth", "rb") as f:
            return serialization.msgpack_restore(f.read())

    rep = run(False, "rep")
    z1 = run(True, "z1")
    la = jax.tree.leaves(rep["model_state_dict"])
    lb = jax.tree.leaves(z1["model_state_dict"])
    assert la and len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_worker_zero1_with_ema_validates(tmp_path):
    """Regression: ``opt.zero1`` + ``opt.ema`` together.  The EMA shadow
    lives inside the data-sharded opt_state; eval_step's in_shardings pin
    params replicated, so the worker must re-place the extracted shadow
    before validation (this raised a jit sharding-mismatch ValueError at
    the first epoch-end validation before the fix)."""
    from flax import serialization
    from test_engine import tiny_cfg, write_protocol_csvs

    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "entropic", epochs=1)
    cfg.name = "z1ema"
    cfg.opt.zero1 = True
    cfg.opt.ema = 0.9
    cfg.output_directory = tmp_path / "out_z1ema"
    engine.worker(cfg)
    # Both checkpoints land: _curr (raw params) and _best (EMA weights).
    with open(tmp_path / "out_z1ema" / "z1ema_curr.pth", "rb") as f:
        curr = serialization.msgpack_restore(f.read())
    with open(tmp_path / "out_z1ema" / "z1ema_best.pth", "rb") as f:
        best = serialization.msgpack_restore(f.read())
    # The best checkpoint stores the smoothed weights — after one epoch
    # they must differ from the raw params (decay 0.9 lags the updates).
    diffs = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(curr["model_state_dict"]),
                             jax.tree.leaves(best["model_state_dict"]))]
    assert any(diffs)


def test_zero1_flag_validation():
    engine.validate_zero1_flags(False, "shard_map", 2)  # off: anything goes
    engine.validate_zero1_flags(True, "gspmd", 1)
    # Multi-process is supported since round 5 (collective checkpoint
    # gather + staged resume placement) — no raise.
    engine.validate_zero1_flags(True, "gspmd", 2)
    with pytest.raises(ValueError, match="gspmd"):
        engine.validate_zero1_flags(True, "shard_map", 1)
