"""ResNeXt / Wide-ResNet variant families: parity against a torch
transcription of the torchvision architecture (tests/torch_ref_model.py).

Covers what the fake-state-dict convert tests cannot: that the flax model
computes the SAME FUNCTION as the reference's torch backbone — stem
padding, maxpool, v1.5 strides, grouped/wide bottleneck widths, eval-mode
BN, global pool, and the two-head contract (reference ``model.py:5-39``).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from openset_imagenet_tpu.convert import torch_state_dict_to_variables
from openset_imagenet_tpu.models.resnet import build_resnet

from torch_ref_model import TORCH_VARIANTS, TorchResNetBase, TorchTwoHead


def _flax_param_count(variant, d=7):
    model = build_resnet(variant, fc_layer_dim=d, out_features=d)
    variables = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(variables["params"]))


def _torch_param_count(variant, d=7):
    with torch.device("meta"):
        m = TorchTwoHead(variant, fc_layer_dim=d, out_features=d)
    return sum(p.numel() for p in m.parameters())


@pytest.mark.parametrize("variant", sorted(TORCH_VARIANTS))
def test_param_count_parity(variant):
    assert _flax_param_count(variant) == _torch_param_count(variant)


@pytest.mark.parametrize("variant,total", [
    # Published torchvision parameter totals (1000-way fc) — anchors the
    # transcription itself, independently of the flax model.
    ("resnext50_32x4d", 25_028_904),
    ("wide_resnet50_2", 68_883_240),
    ("resnext101_32x8d", 88_791_336),
    ("wide_resnet101_2", 126_886_696),
])
def test_transcription_matches_published_totals(variant, total):
    spec = dict(TORCH_VARIANTS[variant])
    with torch.device("meta"):
        m = TorchResNetBase(spec.pop("block"), spec.pop("layers"), **spec)
    assert sum(p.numel() for p in m.parameters()) == total


def _randomize(tmodel, seed):
    g = torch.Generator().manual_seed(seed)
    sd = tmodel.state_dict()
    for k, v in sd.items():
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        elif k.endswith("num_batches_tracked"):
            continue
        else:
            scale = 1.0 / float(np.sqrt(np.prod(v.shape[1:]) or 1.0))
            sd[k] = torch.randn(v.shape, generator=g) * scale
    tmodel.load_state_dict(sd)


@pytest.mark.parametrize("variant", ["tiny", "tiny50", "tinyx"])
def test_forward_parity_vs_torch(variant):
    """Import a randomized torch model and compare eval-mode forwards."""
    d, k = 5, 4
    tmodel = TorchTwoHead(variant, fc_layer_dim=d, out_features=k)
    _randomize(tmodel, seed={"tiny": 11, "tiny50": 22, "tinyx": 33}[variant])
    tmodel.eval()

    model = build_resnet(variant, fc_layer_dim=d, out_features=k,
                         dtype=jnp.float32)
    template = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    tdict = {kk: v.numpy() for kk, v in tmodel.state_dict().items()}
    variables = torch_state_dict_to_variables(tdict, template)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits, t_feat = tmodel(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    logits, feat = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(feat), t_feat.numpy(),
                               rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               rtol=1e-4, atol=5e-4)


@pytest.mark.slow
def test_forward_parity_vs_torch_full_resnext():
    """Full-depth grouped variant (resnext50_32x4d) against torch."""
    d, k = 3, 3
    tmodel = TorchTwoHead("resnext50_32x4d", fc_layer_dim=d, out_features=k)
    _randomize(tmodel, seed=7)
    tmodel.eval()

    model = build_resnet("resnext50_32x4d", fc_layer_dim=d, out_features=k,
                         dtype=jnp.float32)
    template = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    tdict = {kk: v.numpy() for kk, v in tmodel.state_dict().items()}
    variables = torch_state_dict_to_variables(tdict, template)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits, t_feat = tmodel(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    logits, feat = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(feat), t_feat.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               rtol=1e-3, atol=2e-3)


def test_export_grouped_variant_to_torch():
    """flax tinyx -> torch state_dict: loads strict into the torch
    transcription and computes the same eval-mode forward (export
    direction of the interop contract, grouped/wide families)."""
    from openset_imagenet_tpu.convert import variables_to_torch_state_dict

    d, k = 5, 4
    model = build_resnet("tinyx", fc_layer_dim=d, out_features=k,
                         dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)
    tdict = variables_to_torch_state_dict(variables)
    tmodel = TorchTwoHead("tinyx", fc_layer_dim=d, out_features=k)
    missing, unexpected = tmodel.load_state_dict(
        {kk: torch.from_numpy(np.ascontiguousarray(v))
         for kk, v in tdict.items()}, strict=False)
    assert not unexpected
    # num_batches_tracked counters have no flax equivalent; nothing else
    # may be missing.
    assert all(m.endswith("num_batches_tracked") for m in missing)
    tmodel.eval()

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    logits, feat = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        t_logits, t_feat = tmodel(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(feat), t_feat.numpy(),
                               rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               rtol=1e-4, atol=5e-4)


def test_grouped_kernel_shapes():
    """The 3x3 kernels of a grouped bottleneck are [3,3,width/g,width]."""
    model = build_resnet("tinyx", fc_layer_dim=3, out_features=3)
    variables = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    # tinyx: width=8, groups=4, base_width=32 -> stage1 inner width
    # int(8 * 32/64) * 4 = 16, 4 channels per group.
    k = variables["params"]["stage1_block1"]["Conv_1"]["kernel"]
    assert k.shape == (3, 3, 4, 16)


def test_basic_block_rejects_groups():
    from openset_imagenet_tpu.models.resnet import BasicBlock, ResNet50
    model = ResNet50(fc_layer_dim=3, out_features=3, block=BasicBlock,
                     stage_sizes=(1, 1, 1, 1), width=8, groups=2)
    with pytest.raises(ValueError, match="Bottleneck"):
        jax.eval_shape(
            lambda r, x: model.init(r, x, train=False),
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
