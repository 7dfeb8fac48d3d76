"""Space-to-depth stem: exact arithmetic equivalence with the 7x7/2 conv."""

import jax
import jax.numpy as jnp
import numpy as np

from flax import linen as nn
from openset_imagenet_tpu.models.resnet import SpaceToDepthStem, build_resnet


def test_s2d_equals_plain_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    stem = SpaceToDepthStem(features=16, dtype=jnp.float32)
    v = stem.init(jax.random.PRNGKey(0), x)
    kernel = v["params"]["kernel"]

    y_s2d = stem.apply(v, x)
    y_ref = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert y_s2d.shape == y_ref.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_checkpoint_interchangeable_and_model_equivalent():
    from flax import serialization

    x = jnp.asarray(np.random.default_rng(1)
                    .normal(size=(4, 32, 32, 3)).astype(np.float32))
    plain = build_resnet("tiny", fc_layer_dim=4, out_features=4,
                         dtype=jnp.float32)
    s2d = build_resnet("tiny", fc_layer_dim=4, out_features=4,
                       dtype=jnp.float32, space_to_depth=True)
    vp = plain.init(jax.random.PRNGKey(0), x, train=False)
    # Same tree -> load plain params into the s2d model directly.
    vs = s2d.init(jax.random.PRNGKey(0), x, train=False)
    sp = serialization.to_state_dict(vp)
    vs = serialization.from_state_dict(vs, sp)

    lp, fp = plain.apply(vp, x, train=False)
    ls, fs = s2d.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lp), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(fp), rtol=1e-4,
                               atol=1e-4)
