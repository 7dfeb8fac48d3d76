"""Torch-checkpoint import: key mapping, transposition, round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openset_imagenet_tpu.convert import (_torch_key,
                                          torch_state_dict_to_variables)
from openset_imagenet_tpu.models.resnet import build_resnet


def make_template(variant="resnet50", d=6):
    model = build_resnet(variant, fc_layer_dim=d, out_features=d)
    return model, jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))


def fake_torch_dict(template, prefix="", seed=0):
    """Synthesize a torch-style state dict matching the template shapes."""
    rng = np.random.default_rng(seed)
    out = {}
    for coll in ("params", "batch_stats"):
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                template[coll])[0]:
            keys = tuple(getattr(p, "key", getattr(p, "name", p))
                         for p in path)
            tkey = prefix + _torch_key(keys)
            shape = leaf.shape
            if keys[-1] == "kernel":
                shape = ((shape[3], shape[2], shape[0], shape[1])
                         if len(shape) == 4 else (shape[1], shape[0]))
            if tkey.endswith("running_var"):
                # variances must be positive or BN's rsqrt produces NaN
                out[tkey] = rng.uniform(0.5, 2.0, shape).astype(np.float32)
            else:
                # small scale: unnormalised N(0,1) weights explode through
                # 50 bf16 layers into inf/NaN
                scale = 1.0 / np.sqrt(np.prod(shape[1:]) or 1)
                out[tkey] = (rng.normal(size=shape) * scale).astype(
                    np.float32)
    return out


def test_key_mapping_spot_checks():
    assert _torch_key(("conv_init", "kernel")) == "resnet_base.conv1.weight"
    assert _torch_key(("bn_init", "var")) == "resnet_base.bn1.running_var"
    assert _torch_key(("stage1_block1", "Conv_0", "kernel")) == \
        "resnet_base.layer1.0.conv1.weight"
    assert _torch_key(("stage3_block4", "bn2", "scale")) == \
        "resnet_base.layer3.3.bn2.weight"
    assert _torch_key(("stage2_block1", "downsample_bn", "mean")) == \
        "resnet_base.layer2.0.downsample.1.running_mean"
    assert _torch_key(("fc", "kernel")) == "resnet_base.fc.weight"
    assert _torch_key(("logits", "bias")) == "logits.bias"


@pytest.mark.parametrize("prefix", ["", "module."])
def test_roundtrip_fills_every_leaf(prefix):
    model, template = make_template()
    tdict = fake_torch_dict(template, prefix=prefix)
    variables = torch_state_dict_to_variables(tdict, template)

    # Every leaf filled with the mapped (transposed) tensor.
    conv1 = tdict[prefix + "resnet_base.conv1.weight"]
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["conv_init"]["kernel"]),
        np.transpose(conv1, (2, 3, 1, 0)))
    fc_w = tdict[prefix + "resnet_base.fc.weight"]
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["fc"]["kernel"]), fc_w.T)
    bn_var = tdict[prefix + "resnet_base.bn1.running_var"]
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["bn_init"]["var"]), bn_var)

    # The model runs with the imported weights.
    logits, feats = model.apply(
        variables, jnp.zeros((2, 32, 32, 3), jnp.float32), train=False)
    assert logits.shape == (2, 6)


def test_missing_key_and_shape_mismatch_raise():
    model, template = make_template()
    tdict = fake_torch_dict(template)
    bad = dict(tdict)
    del bad["resnet_base.conv1.weight"]
    with pytest.raises(KeyError, match="conv1"):
        torch_state_dict_to_variables(bad, template)
    bad = dict(tdict)
    bad["resnet_base.fc.weight"] = np.zeros((7, 7), np.float32)
    with pytest.raises(ValueError, match="shape"):
        torch_state_dict_to_variables(bad, template)


def test_load_reference_checkpoint_via_torch(tmp_path):
    torch = pytest.importorskip("torch")
    model, template = make_template()
    tdict = {k: torch.from_numpy(v)
             for k, v in fake_torch_dict(template, seed=3).items()}
    path = tmp_path / "ref_best.pth"
    torch.save({"model_state_dict": tdict, "epoch": 42,
                "best_score": 1.5}, path)

    from openset_imagenet_tpu.convert import load_reference_checkpoint
    variables, epoch, best = load_reference_checkpoint(path, model,
                                                       image_size=32)
    assert epoch == 42 and best == 1.5
    logits, _ = model.apply(variables,
                            jnp.zeros((1, 32, 32, 3), jnp.float32),
                            train=False)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_evaluate_cli_accepts_torch_checkpoint(tmp_path):
    """The evaluate CLI transparently converts a reference torch .pth."""
    torch = pytest.importorskip("torch")
    from tests.test_engine import write_protocol_csvs
    from openset_imagenet_tpu.script.evaluate import main

    write_protocol_csvs(tmp_path)
    model, template = make_template("tiny", d=3)
    tdict = {k: torch.from_numpy(v)
             for k, v in fake_torch_dict(template, seed=1).items()}
    out = tmp_path / "exp"
    out.mkdir()
    torch.save({"model_state_dict": tdict, "epoch": 7, "best_score": 0.5},
               out / "entropic_curr.pth")

    main(["entropic", "1",
          "--imagenet-directory", str(tmp_path),
          "--protocol-directory", str(tmp_path),
          "--output-directory", str(out),
          "--batch-size", "8", "--workers", "2",
          "--image-size", "32", "--model-variant", "tiny",
          "--reader", "synthetic"])
    arr = np.load(out / "entropic_test_arr_curr.npz")
    assert arr["scores"].shape[1] == 3
    assert np.all(np.isfinite(arr["scores"]))


def test_worker_finetunes_from_torch_checkpoint(tmp_path):
    """train_mode=finetune accepts the reference's torch .pth directly."""
    torch = pytest.importorskip("torch")
    from tests.test_engine import tiny_cfg, write_protocol_csvs
    from openset_imagenet_tpu import train as engine

    write_protocol_csvs(tmp_path)
    model, template = make_template("tiny", d=3)
    tdict = {k: torch.from_numpy(v)
             for k, v in fake_torch_dict(template, seed=5).items()}
    ref_ckpt = tmp_path / "pretrained.pth"
    torch.save({"model_state_dict": tdict, "epoch": 3, "best_score": 0.9},
               ref_ckpt)

    cfg = tiny_cfg(tmp_path, "entropic", epochs=4,
                   train_mode="finetune")
    cfg.checkpoint = str(ref_ckpt)
    info = engine.worker(cfg)
    # Finetune starts at the stored epoch with best reset to 0.
    assert info["last_epoch"] == 3
    assert np.isfinite(info["best_score"])


def test_export_roundtrip_flax_torch_flax():
    """variables -> torch keys -> variables is the identity."""
    from openset_imagenet_tpu.convert import variables_to_torch_state_dict

    model = build_resnet("tiny", fc_layer_dim=3, out_features=3)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 32, 32, 3), jnp.float32),
                           train=False)
    tdict = variables_to_torch_state_dict(variables)
    back = torch_state_dict_to_variables(tdict, variables)
    for coll in ("params", "batch_stats"):
        a = jax.tree_util.tree_leaves(variables[coll])
        b = jax.tree_util.tree_leaves(back[coll])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-7)


def test_save_reference_checkpoint_loads_back(tmp_path):
    torch = pytest.importorskip("torch")
    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.convert import (load_reference_checkpoint,
                                              save_reference_checkpoint)

    model = build_resnet("tiny", fc_layer_dim=3, out_features=3)
    tx = engine.build_optimizer(
        NameSpace({"type": "adam", "lr": 1e-3, "decay": 0, "gamma": 1}), 1)
    state = engine.create_state(model, jax.random.PRNGKey(0), tx,
                                image_size=32)
    path = tmp_path / "export.pth"
    save_reference_checkpoint(path, state, epoch=4, best_score=1.5)

    variables, epoch, best = load_reference_checkpoint(path, model,
                                                       image_size=32)
    assert epoch == 5 and best == 1.5
    for x, y in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(variables["params"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)
