"""Input pipeline tests: shapes, masking, shuffling, determinism, sharding."""

import numpy as np
import pytest

from openset_imagenet_tpu.pipeline import (Batch, InputPipeline, PILReader,
                                            SyntheticReader)
from openset_imagenet_tpu import transforms as T


def make_pipeline(n=10, batch_size=4, train=True, **kw):
    paths = [f"img_{i}.jpg" for i in range(n)]
    labels = np.arange(n) % 3 - 1  # include some -1 negatives
    return InputPipeline(paths, labels, batch_size, train, seed=7,
                         num_workers=2, reader=SyntheticReader(crop=32), **kw)


def test_static_shapes_and_mask():
    pipe = make_pipeline(n=10, batch_size=4, train=False)
    batches = list(pipe.epoch(0))
    assert len(batches) == len(pipe) == 3
    for b in batches:
        assert b.images.shape == (4, 32, 32, 3)
        assert b.images.dtype == np.uint8
        assert b.labels.shape == (4,)
        assert b.mask.shape == (4,)
    # Final batch: 2 real rows + 2 padded.
    assert batches[-1].mask.tolist() == [1.0, 1.0, 0.0, 0.0]
    assert sum(b.mask.sum() for b in batches) == 10


def test_eval_order_is_sequential():
    pipe = make_pipeline(n=8, batch_size=4, train=False)
    labels = np.concatenate([b.labels for b in pipe.epoch(0)])
    expected = np.arange(8) % 3 - 1
    np.testing.assert_array_equal(labels, expected)


def test_train_shuffle_differs_by_epoch_but_reproducible():
    pipe = make_pipeline(n=64, batch_size=8, train=True)
    e0a = np.concatenate([b.labels for b in pipe.epoch(0)])
    e0b = np.concatenate([b.labels for b in pipe.epoch(0)])
    e1 = np.concatenate([b.labels for b in pipe.epoch(1)])
    np.testing.assert_array_equal(e0a, e0b)
    assert not np.array_equal(e0a, e1)
    # Same multiset of labels either way.
    np.testing.assert_array_equal(np.sort(e0a), np.sort(e1))


def test_process_sharding_partitions_samples():
    """SPMD loading: both processes see the same 3 global batches; their
    local slices are disjoint and cover every sample exactly once."""
    all_idxs = []
    for p in range(2):
        pipe = make_pipeline(n=10, batch_size=4, train=False,
                             process_index=p, process_count=2)
        assert pipe.num_samples == 10
        assert len(pipe) == 3
        got = []
        for b in pipe.epoch(0):
            assert b.images.shape == (2, 32, 32, 3)  # local rows = B/P
            m = np.asarray(b.mask) > 0
            got.extend(np.asarray(b.labels)[m].tolist())
        all_idxs.append(got)
    # 10 real samples total across the two processes, disjoint slices.
    assert len(all_idxs[0]) + len(all_idxs[1]) == 10

    # Local row order reconstructs the global order: process slices are
    # contiguous halves of each global batch.
    pipe = make_pipeline(n=10, batch_size=4, train=False)
    expected = np.arange(10) % 3 - 1
    rebuilt = []
    for b0, b1 in zip(*[make_pipeline(n=10, batch_size=4, train=False,
                                      process_index=p, process_count=2
                                      ).epoch(0) for p in range(2)]):
        for b in (b0, b1):
            m = np.asarray(b.mask) > 0
            rebuilt.extend(np.asarray(b.labels)[m].tolist())
    np.testing.assert_array_equal(rebuilt, expected)


def test_process_sharding_partition_property():
    """Randomized invariants over (n, batch, P, train):
    1. the per-process local slices tile each global batch exactly;
    2. every real sample appears exactly once per epoch;
    3. padding rows sit at the global TAIL of the last batch — the
       invariant the masked-tail BN statistics window relies on
       (train.py tail_step: leading rows are all valid)."""
    rng = np.random.default_rng(7)
    for _ in range(12):
        P = int(rng.choice([1, 2, 4]))
        per = int(rng.integers(1, 5))
        batch = per * P
        n = int(rng.integers(1, 4 * batch + 1))
        train = bool(rng.integers(0, 2))
        pipes = [make_pipeline(n=n, batch_size=batch, train=train,
                               process_index=p, process_count=P)
                 for p in range(P)]
        seen = []
        for batches in zip(*(p.epoch(3) for p in pipes)):
            gmask = np.concatenate([np.asarray(b.mask) for b in batches])
            glabels = np.concatenate([np.asarray(b.labels) for b in batches])
            assert gmask.shape == (batch,)
            valid = gmask > 0
            # (3) padding strictly trails the valid rows globally
            if valid.any():
                assert valid[:int(valid.sum())].all(), (n, batch, P)
            seen.extend(glabels[valid].tolist())
        # (2) each sample exactly once (labels are idx%3-1 over arange)
        assert len(seen) == n, (n, batch, P, train)
        expected = sorted((np.arange(n) % 3 - 1).tolist())
        assert sorted(seen) == expected


def test_sharded_device_put():
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    pipe = make_pipeline(n=8, batch_size=8, train=False, sharding=sharding)
    (batch,) = list(pipe.epoch(0))
    assert isinstance(batch.images, jax.Array)
    assert batch.images.sharding.is_equivalent_to(sharding, 4)
    assert batch.images.shape == (8, 32, 32, 3)


def test_worker_error_propagates():
    def bad_reader(path, rng):
        raise RuntimeError("decode failed")

    pipe = InputPipeline(["a.jpg"], [0], 1, False, reader=bad_reader,
                         num_workers=1)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(pipe.epoch(0))


def test_transform_geometry():
    img = T.decode_image.__globals__  # noqa: F841 (import check)
    from PIL import Image

    # 300x400 -> shorter side 256 keeps aspect.
    pil = Image.fromarray(np.zeros((300, 400, 3), np.uint8))
    resized = T.resize_shorter_side(pil, 256)
    assert min(resized.size) == 256
    w, h = resized.size
    assert abs(w / h - 400 / 300) < 0.01

    arr = np.asarray(resized)
    cc = T.center_crop(arr, 224)
    assert cc.shape == (224, 224, 3)

    rng = T.sample_rng(0, 0, 0)
    rc = T.random_crop(arr, 224, rng)
    assert rc.shape == (224, 224, 3)

    out = T.train_transform(pil, T.sample_rng(1, 2, 3))
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8
    # Determinism: same key -> same result.
    out2 = T.train_transform(pil, T.sample_rng(1, 2, 3))
    np.testing.assert_array_equal(out, out2)


def test_resize_scales_with_large_crops():
    """Crops <= 256 keep the reference Resize(256); larger crops scale by
    the same 256/224 ratio so the window always fits the resized image."""
    from openset_imagenet_tpu.train import _resize_for_crop

    assert _resize_for_crop(224) == 256      # reference pair, verbatim
    assert _resize_for_crop(64) == 256
    assert _resize_for_crop(256) == 256
    for crop in (288, 320, 448):
        r = _resize_for_crop(crop)
        assert r >= crop
        assert abs(r / crop - 256 / 224) < 0.01

    with pytest.raises(ValueError, match="exceeds"):
        PILReader(crop=300, resize=256)
