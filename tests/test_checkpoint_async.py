"""AsyncCheckpointer: overlapped checkpoint writes (extension over the
reference's blocking ``torch.save``, reference ``train.py:55-64``).

Locks the contracts the trainer relies on: byte-identical output vs the
sync writer, FIFO file ordering, snapshot isolation from later in-place
updates of the live state, error surfacing on ``save()``/``wait()``, and
drain-on-close.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_imagenet_tpu import train as engine
from openset_imagenet_tpu.checkpoint import (AsyncCheckpointer,
                                             load_checkpoint,
                                             read_metadata, save_checkpoint)
from openset_imagenet_tpu.config import NameSpace
from openset_imagenet_tpu.models.resnet import build_resnet


@pytest.fixture(scope="module")
def state():
    model = build_resnet("tiny", fc_layer_dim=4, out_features=4)
    tx = engine.build_optimizer(
        NameSpace({"type": "adam", "lr": 1e-3, "decay": 0, "gamma": 1}), 1)
    s = engine.create_state(model, jax.random.PRNGKey(0), tx, image_size=32)
    return s.replace(step=jnp.asarray(17, jnp.int32))


def test_async_write_is_byte_identical_to_sync(tmp_path, state):
    sync_f = tmp_path / "sync.pth"
    async_f = tmp_path / "async.pth"
    save_checkpoint(sync_f, state, epoch=4, best_score=1.25)

    w = AsyncCheckpointer()
    w.save(async_f, state, epoch=4, best_score=1.25)
    w.close()
    assert async_f.read_bytes() == sync_f.read_bytes()


def test_fifo_order_last_write_wins(tmp_path, state):
    """_curr then _best submission order == file write order; two writes
    to the same path leave the later payload on disk."""
    f = tmp_path / "curr.pth"
    w = AsyncCheckpointer()
    for epoch in range(6):
        w.save(f, state, epoch=epoch, best_score=float(epoch))
    w.wait()
    meta = read_metadata(f)
    assert meta["epoch"] == 6 and meta["best_score"] == 5.0
    w.close()


def test_snapshot_isolation_from_donated_update(tmp_path, state):
    """The enqueued snapshot must not see a later donated-buffer update.

    The trainer's jitted step donates the state buffers; save() snapshots
    with on-device copies before the next step can reuse them.
    """
    f = tmp_path / "snap.pth"
    w = AsyncCheckpointer()
    w.save(f, state, epoch=0, best_score=0.0)

    @jax.jit
    def bump(p):
        return jax.tree.map(lambda x: x + 1 if jnp.issubdtype(
            x.dtype, jnp.floating) else x, p)

    # In-place-style update: rebind params; old buffers become garbage.
    bumped = state.replace(params=bump(state.params))
    del state
    w.wait()

    restored, _, _ = load_checkpoint(f, bumped, restore_opt=False)
    leaf = jax.tree_util.tree_leaves(restored.params)[0]
    bumped_leaf = jax.tree_util.tree_leaves(bumped.params)[0]
    assert not np.allclose(np.asarray(leaf), np.asarray(bumped_leaf))
    w.close()


def test_writer_error_surfaces_on_wait(tmp_path, state):
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("occupied")  # mkdir(parents=True) inside will fail
    w = AsyncCheckpointer()
    w.save(blocker / "x" / "ckpt.pth", state, epoch=0, best_score=0.0)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        w.wait()
    # The error is consumed: the writer is reusable afterwards.
    ok = tmp_path / "ok.pth"
    w.save(ok, state, epoch=1, best_score=2.0)
    w.close()
    assert read_metadata(ok)["epoch"] == 2


def test_save_after_close_raises(tmp_path, state):
    w = AsyncCheckpointer()
    w.save(tmp_path / "a.pth", state, epoch=0, best_score=0.0)
    w.close()
    with pytest.raises(RuntimeError, match="closed"):
        w.save(tmp_path / "b.pth", state, epoch=1, best_score=1.0)
    with pytest.raises(RuntimeError, match="closed"):
        w.wait()


def test_queue_is_bounded():
    """Backpressure: a writer slower than the epoch loop must block
    save() (degrade toward sync) instead of pinning unbounded on-device
    state copies.  Capacity 2 = one epoch's _curr+_best pair."""
    w = AsyncCheckpointer()
    assert w._q.maxsize == 2
    w.close()


def test_close_drains_pending_writes(tmp_path, state):
    files = [tmp_path / f"c{i}.pth" for i in range(4)]
    w = AsyncCheckpointer()
    for i, f in enumerate(files):
        w.save(f, state, epoch=i, best_score=float(i))
    w.close()
    for i, f in enumerate(files):
        assert read_metadata(f)["epoch"] == i + 1
