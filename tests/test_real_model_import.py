"""Published-model import smoke (data-gated; `make parity-real`).

The reference publishes trained ResNet-50 checkpoints
(reference ``readme.md:25-33``: three losses x three protocols, torch
``.pth`` with ``model_state_dict`` / ``opt_state_dict``).  This image has
no egress, so the import path has only ever ingested synthesized torch
state dicts (``tests/test_convert.py``).  The moment a real file exists:

    OSI_REFERENCE_MODEL=/path/to/p1_entropic_best.pth make parity-real

and this test imports it through the production converter and runs a
forward pass.  Optionally, ``OSI_REFERENCE_MODEL_LOGITS`` names an ``npz``
with ``images`` (N,3,224,224 float32, torch normalized-to-[0,1] layout or
N,224,224,3) and ``logits`` (N,C) produced by the reference model in eval
mode — then numerical parity is asserted, closing BASELINE.md's OSCR
quality gate at the logit level.
"""

import os

import numpy as np
import pytest

requires_model = pytest.mark.skipif(
    "OSI_REFERENCE_MODEL" not in os.environ,
    reason="set OSI_REFERENCE_MODEL to a published reference .pth "
           "checkpoint to run")


@requires_model
def test_published_checkpoint_imports_and_runs():
    import jax
    import optax

    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.checkpoint import load_weights_any_format
    from openset_imagenet_tpu.config import NameSpace

    path = os.environ["OSI_REFERENCE_MODEL"]
    # n_classes is discoverable from the checkpoint's logits head; default
    # to the common protocol-head sizes and let the converter validate.
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    msd = sd.get("model_state_dict", sd)
    out_features = None
    for k, v in msd.items():
        if k.endswith("logits.weight") or k.endswith("fc2.weight"):
            out_features = int(v.shape[0])
    assert out_features, "could not locate the logits head in the .pth"

    cfg = NameSpace({"model": {"variant": "resnet50"},
                     "data": {"reader": "synthetic"}, "workers": 1,
                     "seed": 42})
    model = engine.build_model(cfg, out_features)
    state = engine.create_state(model, jax.random.PRNGKey(0),
                                optax.identity())
    state, epoch, score = load_weights_any_format(path, state, model)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (4, 224, 224, 3), np.uint8)
    logits, features, scores = engine.make_forward_step()(state, images)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert logits.shape == (4, out_features)
    np.testing.assert_allclose(np.asarray(scores).sum(1), 1.0, rtol=1e-4)

    if "OSI_REFERENCE_MODEL_LOGITS" in os.environ:
        ref = np.load(os.environ["OSI_REFERENCE_MODEL_LOGITS"])
        imgs = ref["images"]
        if imgs.ndim == 4 and imgs.shape[1] == 3:  # NCHW -> NHWC
            imgs = imgs.transpose(0, 2, 3, 1)
        imgs_u8 = np.clip(np.round(imgs * 255.0), 0, 255).astype(np.uint8)
        got, _, _ = engine.make_forward_step()(state, imgs_u8)
        np.testing.assert_allclose(np.asarray(got), ref["logits"],
                                   atol=2e-2, rtol=1e-2)
