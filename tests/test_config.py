"""Config system tests: NameSpace recursion, round-trip, YAML loading."""

import pathlib

from openset_imagenet_tpu.config import NameSpace, load_yaml


def test_namespace_recursive_attributes():
    ns = NameSpace({"a": 1, "b": {"c": 2, "d": {"e": "x"}}})
    assert ns.a == 1
    assert ns.b.c == 2
    assert ns.b.d.e == "x"


def test_namespace_dict_roundtrip():
    src = {"loss": {"type": "garbage", "w": 1.0}, "batch_size": 64}
    ns = NameSpace(src)
    assert ns.dict() == src


def test_namespace_dump_yaml_roundtrip(tmp_path):
    src = {"opt": {"type": "adam", "lr": 1e-3}, "epochs": 120,
           "name": "experiment"}
    ns = NameSpace(src)
    f = tmp_path / "cfg.yaml"
    f.write_text(ns.dump())
    ns2 = load_yaml(f)
    assert ns2.dict() == src


def test_namespace_mutation_and_dump(tmp_path):
    """The sweep driver mutates fields then re-dumps (train_all semantics)."""
    ns = NameSpace({"loss": {"type": "entropic"}, "name": "experiment",
                    "checkpoint": None})
    ns.loss.type = "softmax"
    ns.name = "softmax"
    ns.checkpoint = "softmax_curr.ckpt"
    out = tmp_path / "softmax.yaml"
    out.write_text(ns.dump())
    again = load_yaml(out)
    assert again.loss.type == "softmax"
    assert again.checkpoint == "softmax_curr.ckpt"


def test_namespace_dump_handles_paths():
    ns = NameSpace({"output_directory": pathlib.Path("/tmp/x")})
    assert "/tmp/x" in ns.dump()


def test_namespace_get_and_contains():
    ns = NameSpace({"a": 1})
    assert "a" in ns
    assert "z" not in ns
    assert ns.get("z", 5) == 5
