"""SubsetBatchNorm: parity with flax BatchNorm and subset-stat semantics."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openset_imagenet_tpu.models.norm import SubsetBatchNorm


def make_x(b=16, hw=4, c=8, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, hw, hw, c),
                             jnp.float32) * 2 + 0.5


def test_full_stats_matches_flax_batchnorm():
    x = make_x()
    ours = SubsetBatchNorm(use_running_average=False, stats_rows=0)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, use_fast_variance=True)
    vo = ours.init(jax.random.PRNGKey(1), x)
    vr = ref.init(jax.random.PRNGKey(1), x)
    yo, so = ours.apply(vo, x, mutable=["batch_stats"])
    yr, sr = ref.apply(vr, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yo), np.asarray(yr), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(so["batch_stats"]["mean"]),
        np.asarray(sr["batch_stats"]["mean"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(so["batch_stats"]["var"]),
        np.asarray(sr["batch_stats"]["var"]), rtol=1e-5)


def test_subset_stats_use_leading_rows_only():
    x = make_x(b=16)
    mod = SubsetBatchNorm(use_running_average=False, stats_rows=4)
    v = mod.init(jax.random.PRNGKey(0), x)
    y_full, st = mod.apply(v, x, mutable=["batch_stats"])
    # Changing trailing rows must not change the statistics...
    x2 = x.at[8:].set(x[8:] * 100)
    _, st2 = mod.apply(v, x2, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(st["batch_stats"]["mean"]),
                               np.asarray(st2["batch_stats"]["mean"]))
    # ...but changing a leading row must.
    x3 = x.at[0].set(x[0] + 10)
    _, st3 = mod.apply(v, x3, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(st["batch_stats"]["mean"]),
                           np.asarray(st3["batch_stats"]["mean"]))


def test_eval_mode_uses_running_averages():
    x = make_x()
    mod = SubsetBatchNorm(use_running_average=True, stats_rows=4)
    v = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(v, x)
    # running stats are 0-mean/1-var at init -> identity modulo eps scale
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4,
                               atol=1e-4)


def test_state_dict_compatible_with_batchnorm_names():
    x = make_x()
    v = SubsetBatchNorm(stats_rows=2).init(jax.random.PRNGKey(0), x)
    assert set(v["params"]) == {"scale", "bias"}
    assert set(v["batch_stats"]) == {"mean", "var"}


def test_resnet_with_ghost_bn_runs_and_checkpoints_interchange():
    from openset_imagenet_tpu.models.resnet import build_resnet
    from flax import serialization

    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    plain = build_resnet("tiny", fc_layer_dim=4, out_features=4)
    ghost = build_resnet("tiny", fc_layer_dim=4, out_features=4,
                         bn_stats_rows=4)
    vp = plain.init(jax.random.PRNGKey(0), x, train=False)
    vg = ghost.init(jax.random.PRNGKey(0), x, train=False)
    # Identical pytree structure -> checkpoints are interchangeable.
    sp = serialization.to_state_dict(vp)
    sg = serialization.to_state_dict(vg)
    assert jax.tree_util.tree_structure(sp) == jax.tree_util.tree_structure(sg)
    (lg, ft), _ = ghost.apply(vg, jax.random.normal(jax.random.PRNGKey(1),
                                                    x.shape),
                              train=True, mutable=["batch_stats"])
    assert np.all(np.isfinite(np.asarray(lg)))
