"""Checkpoint arch metadata: stored at save time, stream-readable, and
used by evaluate/serving to rebuild the trained architecture without a
``--model-variant`` flag (the reference hardcodes resnet50, reference
``script/evaluate.py:103-110`` — this is the extension that makes the
variant families usable end to end)."""
import numpy as np
import pytest
from flax import serialization

from openset_imagenet_tpu.checkpoint import (infer_arch, read_metadata,
                                             save_checkpoint)


class _FakeState:
    params = {"w": np.ones((2, 3), np.float32)}
    batch_stats = {"m": np.zeros(3, np.float32)}
    opt_state = {}
    step = 7


def test_extra_is_stream_readable_before_tensors(tmp_path):
    f = tmp_path / "c.pth"
    save_checkpoint(f, _FakeState(), epoch=3, best_score=0.5,
                    extra={"arch": {"variant": "resnext50_32x4d",
                                    "space_to_depth": True}})
    blob = f.read_bytes()
    # The extra map must precede the tensor collections in the payload
    # so read_metadata's streaming unpack never touches a weight.
    assert blob.index(b"extra") < blob.index(b"model_state_dict")
    meta = read_metadata(f)
    assert meta["epoch"] == 4 and meta["best_score"] == 0.5
    assert meta["extra"]["arch"]["variant"] == "resnext50_32x4d"
    assert infer_arch(f) == {"variant": "resnext50_32x4d",
                             "space_to_depth": True}


def test_checkpoint_without_extra_still_reads(tmp_path):
    f = tmp_path / "c.pth"
    save_checkpoint(f, _FakeState(), epoch=1, best_score=2.0)
    meta = read_metadata(f)
    assert meta == {"epoch": 2, "best_score": 2.0}
    assert infer_arch(f) == {}


def test_old_layout_checkpoint_still_reads(tmp_path):
    """Pre-metadata layout (extra trailing the tensors): read_metadata
    keeps its epoch/best contract; infer_arch answers {} (fallback to
    resnet50 downstream)."""
    payload = {
        "epoch": 9,
        "step": 1,
        "best_score": 1.5,
        "model_state_dict": {"w": np.ones((2, 2), np.float32)},
        "batch_stats": {},
        "opt_state_dict": {},
    }
    f = tmp_path / "old.pth"
    f.write_bytes(serialization.msgpack_serialize(payload))
    meta = read_metadata(f)
    assert meta["epoch"] == 9 and meta["best_score"] == 1.5
    assert infer_arch(f) == {}


def test_infer_arch_on_torch_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    f = tmp_path / "ref.pth"
    torch.save({"epoch": 5, "best_score": 0.1,
                "model_state_dict": {}}, f)
    assert infer_arch(f) == {}


def test_infer_arch_missing_file():
    assert infer_arch("/nonexistent/path.pth") == {}


def test_infer_arch_never_torch_loads(tmp_path, monkeypatch):
    """A reference torch .pth can never carry arch metadata — infer_arch
    must answer {} without torch.load()ing the (potentially multi-
    hundred-MB) file a second time at CLI startup."""
    torch = pytest.importorskip("torch")
    f = tmp_path / "ref.pth"
    torch.save({"epoch": 5, "model_state_dict": {}}, f)

    def _boom(*a, **k):
        raise AssertionError("infer_arch must not torch.load")

    monkeypatch.setattr(torch, "load", _boom)
    assert infer_arch(f) == {}


def test_resolve_model_cfg_precedence(tmp_path):
    from openset_imagenet_tpu.checkpoint import resolve_model_cfg

    f = tmp_path / "c.pth"
    save_checkpoint(f, _FakeState(), epoch=0, best_score=0.0,
                    extra={"arch": {"variant": "wide_resnet50_2",
                                    "space_to_depth": True}})
    # Metadata wins when no explicit variant is given...
    assert resolve_model_cfg(f) == {"variant": "wide_resnet50_2",
                                    "space_to_depth": True}
    # ...an explicit variant overrides it (S2D still from metadata)...
    assert resolve_model_cfg(f, "resnet18")["variant"] == "resnet18"
    # ...and no metadata at all means the reference defaults.
    assert resolve_model_cfg("/nonexistent.pth") == {
        "variant": "resnet50", "space_to_depth": False}
