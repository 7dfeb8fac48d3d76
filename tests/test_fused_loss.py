"""Pallas fused entropic loss vs the plain-JAX implementation.

Runs in interpreter mode on the CPU test platform; the same kernel compiles
on TPU.  Checks value and gradient parity, masking, and odd class counts
(e.g. protocol-1's 116 knowns — not lane-aligned).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_imagenet_tpu.ops.fused_loss import entropic_openset_loss_fused
from openset_imagenet_tpu.ops.losses import entropic_openset_loss


def make_batch(b=16, c=116, seed=0):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32) * 3)
    labels = jnp.asarray(rng.integers(-1, c, b).astype(np.int32))
    mask = jnp.asarray((rng.random(b) > 0.2).astype(np.float32))
    return logits, labels, mask


@pytest.mark.parametrize("c", [8, 116, 128, 1000])
@pytest.mark.parametrize("w", [1.0, 0.5])
def test_forward_matches_reference(c, w):
    logits, labels, mask = make_batch(c=c)
    ref_mean, ref_count = entropic_openset_loss(
        logits, labels, unk_weight=w, sample_mask=mask)
    got_mean, got_count = entropic_openset_loss_fused(
        logits, labels, mask, w)
    assert float(got_count) == float(ref_count)
    np.testing.assert_allclose(float(got_mean), float(ref_mean), rtol=1e-5)


def test_gradient_matches_reference():
    logits, labels, mask = make_batch(b=8, c=32)

    def ref(lg):
        return entropic_openset_loss(lg, labels, sample_mask=mask)[0]

    def fused(lg):
        return entropic_openset_loss_fused(lg, labels, mask, 1.0)[0]

    g_ref = jax.grad(ref)(logits)
    g_fused = jax.grad(fused)(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_masked_rows_contribute_nothing():
    logits, labels, _ = make_batch(b=8, c=16)
    mask = jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)
    full_mean, _ = entropic_openset_loss_fused(
        logits[:4], labels[:4], jnp.ones(4), 1.0)
    masked_mean, count = entropic_openset_loss_fused(logits, labels, mask,
                                                     1.0)
    assert float(count) == 4
    np.testing.assert_allclose(float(masked_mean), float(full_mean),
                               rtol=1e-6)
    # Gradient of padded rows is exactly zero.
    g = jax.grad(lambda lg: entropic_openset_loss_fused(
        lg, labels, mask, 1.0)[0])(logits)
    assert np.all(np.asarray(g)[4:] == 0)


def test_multiblock_grid():
    """More rows than one block -> grid accumulation across programs."""
    logits, labels, mask = make_batch(b=600, c=16, seed=3)
    ref_mean, ref_count = entropic_openset_loss(logits, labels,
                                                sample_mask=mask)
    got_mean, got_count = entropic_openset_loss_fused(logits, labels, mask,
                                                      1.0)
    assert float(got_count) == float(ref_count)
    np.testing.assert_allclose(float(got_mean), float(ref_mean), rtol=1e-5)


def test_under_jit_and_in_train_step():
    logits, labels, mask = make_batch(b=8, c=12)
    f = jax.jit(lambda lg: entropic_openset_loss_fused(lg, labels, mask,
                                                       1.0))
    mean, count = f(logits)
    ref_mean, _ = entropic_openset_loss(logits, labels, sample_mask=mask)
    np.testing.assert_allclose(float(mean), float(ref_mean), rtol=1e-5)


@pytest.mark.parametrize("c", [8, 116])
def test_softmax_fused_matches_reference(c):
    from openset_imagenet_tpu.ops.fused_loss import softmax_loss_fused
    from openset_imagenet_tpu.ops.losses import softmax_loss

    logits, labels, mask = make_batch(c=c, seed=7)
    ref_m, ref_c = softmax_loss(logits, labels, sample_mask=mask)
    got_m, got_c = softmax_loss_fused(logits, labels, sample_mask=mask)
    assert float(got_c) == float(ref_c)
    np.testing.assert_allclose(float(got_m), float(ref_m), rtol=1e-5)
    g_ref = jax.grad(lambda lg: softmax_loss(lg, labels,
                                             sample_mask=mask)[0])(logits)
    g_got = jax.grad(lambda lg: softmax_loss_fused(
        lg, labels, sample_mask=mask)[0])(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("c", [8, 116])
def test_garbage_fused_matches_reference(c):
    from openset_imagenet_tpu.ops.fused_loss import garbage_loss_fused
    from openset_imagenet_tpu.ops.losses import garbage_loss

    rng = np.random.default_rng(9)
    logits = jnp.asarray(rng.normal(size=(24, c)).astype(np.float32) * 2)
    labels = jnp.asarray(rng.integers(0, c, 24).astype(np.int32))
    mask = jnp.asarray((rng.random(24) > 0.2).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))
    ref_m, ref_c = garbage_loss(logits, labels, w, sample_mask=mask)
    got_m, got_c = garbage_loss_fused(logits, labels, w, sample_mask=mask)
    np.testing.assert_allclose(float(got_c), float(ref_c), rtol=1e-6)
    np.testing.assert_allclose(float(got_m), float(ref_m), rtol=1e-5)
    g_ref = jax.grad(lambda lg: garbage_loss(lg, labels, w,
                                             sample_mask=mask)[0])(logits)
    g_got = jax.grad(lambda lg: garbage_loss_fused(
        lg, labels, w, sample_mask=mask)[0])(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_fused_under_multi_device_mesh():
    """The Pallas custom call must compose with GSPMD sharding."""
    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.models.resnet import build_resnet
    from openset_imagenet_tpu.parallel.mesh import (batch_sharding,
                                                    make_mesh, replicated)

    mesh = make_mesh(8)
    model = build_resnet("tiny", fc_layer_dim=4, out_features=4)
    tx = engine.build_optimizer(
        NameSpace({"type": "adam", "lr": 1e-3, "decay": 0, "gamma": 1}), 1)
    rng = np.random.default_rng(0)
    sh = batch_sharding(mesh)
    img = jax.device_put(rng.integers(0, 256, (16, 32, 32, 3), np.uint8),
                         sh)
    lab = jax.device_put(rng.integers(-1, 4, 16).astype(np.int32), sh)
    msk = jax.device_put(np.ones(16, np.float32), sh)
    losses = {}
    for fused in (False, True):
        state = jax.device_put(
            engine.create_state(model, jax.random.PRNGKey(0), tx,
                                image_size=32), replicated(mesh))
        step = engine.make_train_step(engine.make_loss_fn("entropic",
                                                          fused=fused),
                                      mesh)
        _, m = step(state, img, lab, msk)
        losses[fused] = float(m["loss_sum"])
    assert losses[True] == pytest.approx(losses[False], rel=1e-6)
