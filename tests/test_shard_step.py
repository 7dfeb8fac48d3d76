"""shard_map training mode: collective math parity with the GSPMD path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_imagenet_tpu import train as engine
from openset_imagenet_tpu.config import NameSpace
from openset_imagenet_tpu.models.resnet import build_resnet
from openset_imagenet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                replicated)
from openset_imagenet_tpu.parallel.shard_step import (
    make_train_step_shard_map, place_for_shard_map)


def build(dtype=jnp.float32):
    model = build_resnet("tiny", fc_layer_dim=4, out_features=4,
                         dtype=dtype)
    tx = engine.build_optimizer(
        NameSpace({"type": "sgd", "lr": 0.1, "decay": 0, "gamma": 1}), 1)
    state = engine.create_state(model, jax.random.PRNGKey(0), tx,
                                image_size=32)
    return state


def identical_shard_batch(mesh, per_dev=2):
    """Every device gets the SAME rows, so per-device BN statistics equal
    global-batch statistics and the two modes must agree exactly."""
    n = mesh.size * per_dev
    rng = np.random.default_rng(0)
    img_one = rng.integers(0, 256, (per_dev, 32, 32, 3), np.uint8)
    lab_one = np.array([0, -1], np.int32)[:per_dev]
    images = np.tile(img_one, (mesh.size, 1, 1, 1))
    labels = np.tile(lab_one, mesh.size)
    mask = np.ones(n, np.float32)
    return images, labels, mask


@pytest.mark.parametrize("loss_type", ["entropic", "softmax"])
def test_shard_map_matches_gspmd_on_replicated_rows(loss_type):
    mesh = make_mesh(8)
    images, labels, mask = identical_shard_batch(mesh)
    loss_fn = engine.make_loss_fn(loss_type)

    def run(step_factory):
        state = build()
        state, batch = place_for_shard_map(state,
                                           (images, labels, mask), mesh)
        step = step_factory(loss_fn, mesh)
        new_state, m = step(state, *batch)
        return (jax.tree.map(np.asarray, new_state.params),
                float(m["loss_sum"]) / max(float(m["count"]), 1))

    params_sm, loss_sm = run(make_train_step_shard_map)
    params_gs, loss_gs = run(engine.make_train_step)
    # Equal modulo float reduction order (16-row global vs 2-row local
    # sums through 4 BN layers); a real weighting/collective bug shows up
    # orders of magnitude larger.
    assert loss_sm == pytest.approx(loss_gs, rel=2e-4)
    # Per-device 2-row fast-variance (E[x^2]-E[x]^2) is cancellation-noisy
    # vs the 16-row global reduction; after an lr=0.1 SGD step the BN
    # parameters carry up to ~1e-2 relative noise. A weighting/collective
    # bug would be ~mesh-size (8x) off, far outside this band.
    for a, b in zip(jax.tree.leaves(params_sm), jax.tree.leaves(params_gs)):
        np.testing.assert_allclose(a, b, rtol=1.5e-2, atol=2e-3)


def test_shard_map_per_device_stats_differ_from_global():
    """With different rows per device, the normalization (and therefore the
    loss) must differ from global-batch BN — proving stats are local."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    n = 16
    images = rng.integers(0, 256, (n, 32, 32, 3), np.uint8)
    labels = rng.integers(-1, 4, n).astype(np.int32)
    mask = np.ones(n, np.float32)
    loss_fn = engine.make_loss_fn("entropic")

    def run(step_factory):
        state = build()
        state, batch = place_for_shard_map(state,
                                           (images, labels, mask), mesh)
        new_state, m = step_factory(loss_fn, mesh)(state, *batch)
        return float(m["loss_sum"])

    loss_sm = run(make_train_step_shard_map)
    loss_gs = run(engine.make_train_step)
    assert np.isfinite(loss_sm) and np.isfinite(loss_gs)
    assert loss_sm != pytest.approx(loss_gs, rel=1e-9)


def test_shard_map_runs_with_fused_loss_and_garbage():
    mesh = make_mesh(8)
    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, (16, 32, 32, 3), np.uint8)
    labels = rng.integers(0, 4, 16).astype(np.int32)
    mask = np.ones(16, np.float32)
    weights = np.ones(4, np.float32)
    for loss_fn in (engine.make_loss_fn("entropic", fused=True),
                    engine.make_loss_fn("garbage", class_weights=weights)):
        state = build()
        state, batch = place_for_shard_map(state,
                                           (images, labels, mask), mesh)
        new_state, m = make_train_step_shard_map(loss_fn, mesh)(state,
                                                                *batch)
        assert np.isfinite(float(m["loss_sum"]))


def test_worker_with_shard_map_mode(tmp_path):
    from tests.test_engine import tiny_cfg, write_protocol_csvs

    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "entropic", epochs=2)
    cfg.parallel_mode = "shard_map"
    info = engine.worker(cfg)
    assert np.isfinite(info["best_score"])
    assert (cfg.output_directory / "entropic_curr.pth").exists()
