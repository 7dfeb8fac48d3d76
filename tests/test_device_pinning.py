"""Per-run device isolation: --gpu pins a run's mesh to one device.

Reference parity: ``script/train.py:58-60`` pins each sweep subprocess to
one GPU; here the pin is a single-device JAX mesh (honest semantics for
parallel sweep queues instead of a dead compatibility flag).
"""

import jax
import pytest

from openset_imagenet_tpu.parallel.mesh import (data_mesh_for_batch,
                                                select_device)
from tests.test_engine import tiny_cfg, write_protocol_csvs


def test_select_device_returns_requested():
    devs = select_device(3)
    assert len(devs) == 1 and devs[0] is jax.devices()[3]


def test_select_device_out_of_range():
    with pytest.raises(ValueError, match="out of range"):
        select_device(99)


def test_make_mesh_never_truncates_silently():
    """Requesting more devices than exist raises instead of quietly
    running on fewer."""
    from openset_imagenet_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="are available"):
        make_mesh(num_devices=99)
    with pytest.raises(ValueError, match="are available"):
        make_mesh(num_devices=0)


def test_mesh_restricted_to_device():
    mesh = data_mesh_for_batch(8, devices=select_device(5))
    assert [d.id for d in mesh.devices.flat] == [5]


def test_mesh_warns_and_shrinks_on_non_divisible_batch():
    """Single-host: a batch not divisible by the device count shrinks the
    mesh to the largest divisor and warns loudly (mesh.py:91-95)."""
    n = len(jax.devices())
    assert n == 8, "conftest forces an 8-device virtual mesh"
    with pytest.warns(UserWarning, match="not divisible"):
        mesh = data_mesh_for_batch(6)  # gcd-style largest divisor <= 8 is 6
    assert mesh.devices.size == 6


def test_mesh_no_warning_on_divisible_batch(recwarn):
    mesh = data_mesh_for_batch(16)
    assert mesh.devices.size == len(jax.devices())
    assert not [w for w in recwarn.list
                if issubclass(w.category, UserWarning)
                and "divisible" in str(w.message)]


def test_worker_honors_cfg_gpu(tmp_path):
    from openset_imagenet_tpu import train as engine

    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "entropic", epochs=1)
    cfg.gpu = 3
    info = engine.worker(cfg)
    assert info["device_ids"] == [jax.devices()[3].id]


def test_worker_default_uses_full_mesh(tmp_path):
    from openset_imagenet_tpu import train as engine

    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "entropic", epochs=1)
    info = engine.worker(cfg)
    assert info["device_ids"] == [d.id for d in jax.devices()]


def test_train_all_queues_pin_disjoint_devices(tmp_path, monkeypatch):
    """--gpus 0 1: runs round-robin over two queues, each pinned by --gpu."""
    from openset_imagenet_tpu.script.train_all import commands, get_args

    write_protocol_csvs(tmp_path)
    cfg_file = tmp_path / "sweep.yaml"
    cfg_file.write_text(tiny_cfg(tmp_path, "entropic", epochs=1).dump())
    args = get_args(["--configuration", str(cfg_file),
                     "--protocols", "1",
                     "--loss-functions", "softmax", "entropic", "garbage",
                     "--output-directory", str(tmp_path / "exp"),
                     "--gpus", "0", "1"])
    queues = commands(args)
    assert len(queues) == 2
    assert [len(q) for q in queues] == [2, 1]
    for qi, queue in enumerate(queues):
        for call in queue:
            assert call[call.index("--gpu") + 1] == str(qi)
