"""ResNet-50 model tests: shapes, two-head contract, parameter count parity
with the torchvision model the reference builds (reference model.py:5-39)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_imagenet_tpu.models.resnet import ResNet50


def _init(model, shape=(2, 64, 64, 3)):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return variables, x


def test_forward_returns_logits_and_features():
    model = ResNet50(fc_layer_dim=16, out_features=16, logit_bias=False)
    variables, x = _init(model)
    logits, features = model.apply(variables, x, train=False)
    assert logits.shape == (2, 16)
    assert features.shape == (2, 16)
    assert logits.dtype == jnp.float32


def test_train_mode_updates_batch_stats():
    model = ResNet50(fc_layer_dim=8, out_features=8, logit_bias=False)
    variables, x = _init(model)
    x = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    (logits, _), new_state = model.apply(
        variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    changed = any(not np.allclose(a, b) for a, b in zip(old, new))
    assert changed


def _param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def test_param_count_matches_torchvision_formula():
    """torchvision resnet50 with fc untouched has 25,557,032 params
    (23,508,032 backbone + 2048*1000+1000 fc).  The reference replaces fc by
    Linear(2048, D) and adds Linear(D, K, bias=False)."""
    D = K = 116  # protocol-1 entropic class count
    model = ResNet50(fc_layer_dim=D, out_features=K, logit_bias=False)
    # eval_shape avoids an expensive full-ResNet XLA compile on CPU.
    variables = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    n = _param_count(variables["params"])
    backbone_with_fc = 23508032 + (2048 * D + D)
    expected = backbone_with_fc + D * K
    assert n == expected


def _shape_init(model, shape=(1, 32, 32, 3)):
    return jax.eval_shape(lambda r, x: model.init(r, x, train=False),
                          jax.random.PRNGKey(0), jnp.zeros(shape, jnp.float32))


def test_logit_bias_flag():
    m1 = ResNet50(fc_layer_dim=8, out_features=8, logit_bias=True)
    m2 = ResNet50(fc_layer_dim=8, out_features=8, logit_bias=False)
    v1 = _shape_init(m1)
    v2 = _shape_init(m2)
    assert "bias" in v1["params"]["logits"]
    assert "bias" not in v2["params"]["logits"]


def test_stride_reduction_structure():
    """Input 224 -> 7x7 feature map before the global pool (stride 32)."""
    model = ResNet50(fc_layer_dim=4, out_features=4)
    variables = _shape_init(model, (1, 224, 224, 3))
    # count batch_stats collections: 53 BN layers in resnet50
    bn_leaves = jax.tree_util.tree_leaves(variables["batch_stats"])
    assert len(bn_leaves) == 53 * 2  # mean + var each


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_compute_dtype(dtype):
    model = ResNet50(fc_layer_dim=4, out_features=4, dtype=dtype)
    variables, x = _init(model, (1, 32, 32, 3))
    logits, feats = model.apply(variables, x, train=False)
    assert logits.dtype == jnp.float32  # heads always return f32


def test_remat_blocks_identical_step():
    """nn.remat'd blocks: same loss, gradients, and batch-stats updates.

    Remat trades HBM activation traffic for recompute FLOPs (the TPU train
    step is bandwidth-bound); arithmetic must be unchanged.
    """
    import numpy as np
    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.models.resnet import build_resnet

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (8, 32, 32, 3), np.uint8)
    labels = np.array([0, 1, 2, 3, -1, -1, 2, 0], np.int32)
    mask = np.ones(8, np.float32)

    def run(remat):
        model = build_resnet("tiny", fc_layer_dim=4, out_features=4,
                             dtype=jnp.float32, space_to_depth=True,
                             bn_stats_rows=4, remat=remat)
        tx = engine.build_optimizer(
            NameSpace({"type": "sgd", "lr": 0.1, "decay": 0, "gamma": 1}), 1)
        state = engine.create_state(model, jax.random.PRNGKey(0), tx,
                                    image_size=32)
        step = engine.make_train_step(engine.make_loss_fn("entropic"))
        new_state, m = step(state, images, labels, mask)
        return new_state, float(m["loss_sum"])

    plain, loss_p = run(False)
    remat, loss_r = run(True)
    assert loss_p == pytest.approx(loss_r, rel=1e-6)
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, plain.params)),
                    jax.tree.leaves(jax.tree.map(np.asarray, remat.params))):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    for a, b in zip(
            jax.tree.leaves(jax.tree.map(np.asarray, plain.batch_stats)),
            jax.tree.leaves(jax.tree.map(np.asarray, remat.batch_stats))):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_dot_1x1_identical_to_conv_form():
    """Conv1x1 (explicit MXU dot): same param tree, outputs, and gradients
    as the nn.Conv 1x1 form — checkpoint-interchangeable."""
    import numpy as np
    from openset_imagenet_tpu.models.resnet import Bottleneck

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 32)).astype(np.float32))

    from functools import partial
    from flax import linen as nn

    norm = partial(nn.BatchNorm, use_running_average=False, momentum=0.9,
                   epsilon=1e-5, dtype=jnp.float32)

    def build(dot):
        block = Bottleneck(filters=16, strides=2, dtype=jnp.float32,
                           norm=norm, dot_1x1=dot)
        vs = block.init(jax.random.PRNGKey(7), x)
        return block, vs

    conv_block, conv_vs = build(False)
    dot_block, dot_vs = build(True)
    # Identical parameter trees (names and shapes).
    assert jax.tree.map(jnp.shape, conv_vs["params"]) == \
        jax.tree.map(jnp.shape, dot_vs["params"])

    def f(block, vs):
        def loss(params):
            y, _ = block.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                x, mutable=["batch_stats"])
            return jnp.sum(y ** 2)
        val, grads = jax.value_and_grad(loss)(vs["params"])
        return val, grads

    v1, g1 = f(conv_block, conv_vs)
    v2, g2 = f(dot_block, conv_vs)  # same init weights through both paths
    assert float(v1) == pytest.approx(float(v2), rel=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
