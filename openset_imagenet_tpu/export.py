"""Deployment export: serialize the serving forward to a portable artifact.

Beyond the reference's inventory — the reference deploys nothing (its
pipeline ends at offline score extraction, reference
``script/evaluate.py:82-149``).  This module finishes the serving story
for production: :func:`export_serving` lowers the trained two-head
forward to a **self-contained StableHLO artifact** via ``jax.export``
with

* the checkpoint's weights baked in as constants (no Python model code,
  no checkpoint file, no flax needed at the deployment site),
* a **symbolic batch dimension**, so ONE artifact serves every batch
  size without recompiling Python-side (the consumer's runtime still
  specializes per shape, exactly like our bucketed
  :class:`~openset_imagenet_tpu.inference.OpenSetPredictor`),
* **multi-platform lowering** (``cpu`` + ``tpu`` by default): the same
  file validates on a CPU host in CI and deploys on TPU serving hosts,
* an optional **serving-config sidecar** (``model.stablehlo.json``,
  :func:`metadata_path`) carrying geometry, rejection mode/threshold
  (including an FPR-calibrated operating point) and provenance, so the
  pair is a complete deployment bundle:
  ``predict_imagenet model.stablehlo auto imgs/`` serves with zero
  re-specified configuration.

The artifact computes exactly what the live predictor's jitted forward
computes (``train.make_forward_step``): uint8 ``[N, H, W, 3]`` images →
``(logits, features, scores)`` with scores = float32 softmax — the
inputs every open-set rejection rule downstream consumes
(reference ``metrics.py:45-62``).

:func:`load_serving` deserializes and returns a callable for the local
backend; any StableHLO-speaking runtime (jax, PJRT C API, IREE, ...)
can consume the file without this package.
"""

from __future__ import annotations

import pathlib

import numpy as np

ARTIFACT_SUFFIX = ".stablehlo"

#: Serving-config keys a metadata sidecar may carry.  The predictor
#: resolves any constructor argument the caller left as ``None`` from
#: these, so an exported bundle serves with zero re-specified
#: configuration (``predict_imagenet model.stablehlo auto imgs/``).
METADATA_KEYS = ("n_classes", "image_size", "variant", "mode",
                 "has_background", "threshold")


def metadata_path(path) -> pathlib.Path:
    """Sidecar path for an artifact: ``model.stablehlo.json``.

    A sidecar (not an envelope format) keeps the ``.stablehlo`` file
    itself pure StableHLO bytes — any PJRT/IREE consumer reads it
    unchanged; only this package's serving layer looks for the json.
    """
    path = pathlib.Path(path)
    return path.with_name(path.name + ".json")


def read_metadata(path) -> dict:
    """Read an artifact's serving-config sidecar; ``{}`` if absent.

    Missing/corrupt sidecars degrade to the no-metadata behavior (the
    caller must then supply the serving config explicitly) rather than
    failing the load: the artifact alone is still a complete program.
    """
    import json

    side = metadata_path(path)
    try:
        meta = json.loads(side.read_text())
    except (OSError, ValueError):
        return {}
    return meta if isinstance(meta, dict) else {}


def build_serving_fn(checkpoint, n_classes: int,
                     variant: str | None = None, image_size: int = 224,
                     optimize: str | None = None, calibration=None,
                     calibration_percentile: float | None = None):
    """Load a checkpoint and close the serving forward over its weights.

    Same model construction + weight loading as
    :class:`~openset_imagenet_tpu.inference.OpenSetPredictor` (native
    msgpack or reference-torch checkpoints both load), but returns a
    pure ``images_uint8 -> (logits, features, scores)`` function with
    the weights captured — the exportable unit.

    ``optimize`` / ``calibration`` bake an optimized inference graph
    (:func:`openset_imagenet_tpu.optimize.optimized_inference`:
    ``fold_bn`` or ``int8``) into the exported artifact — quantization
    scales and all, so the deployment site needs no calibration data.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from . import train as engine
    from .checkpoint import load_weights_any_format, resolve_model_cfg
    from .config import NameSpace

    cfg = NameSpace({"model": resolve_model_cfg(checkpoint, variant),
                     "seed": 0, "data": {}})
    model = engine.build_model(cfg, n_classes)
    state = engine.create_state(model, jax.random.PRNGKey(0),
                                optax.identity(), image_size=image_size)
    state, _, _ = load_weights_any_format(checkpoint, state, model,
                                          image_size=image_size)
    if optimize is not None:
        from .optimize import optimized_inference

        _, state = optimized_inference(model, state, optimize,
                                       calibration=calibration,
                                       image_size=image_size,
                                       percentile=calibration_percentile)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    apply_fn = state.apply_fn

    def forward(images):
        imgs = images.astype(jnp.float32) * (1.0 / 255.0)
        logits, features = apply_fn(variables, imgs, train=False)
        scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return logits, features, scores

    return forward


def export_serving(checkpoint, n_classes: int, variant: str = "resnet50",
                   image_size: int = 224, batch_size=None,
                   platforms=("cpu", "tpu"), optimize: str | None = None,
                   calibration=None,
                   calibration_percentile: float | None = None):
    """Export the serving forward; returns a ``jax.export.Exported``.

    Args:
        checkpoint: trained ``.pth`` (native or reference-torch format).
        n_classes: logits dimensionality the model was trained with
            (garbage models include their background class).
        variant / image_size: model geometry, as trained.
        batch_size: fix the batch dimension to this int, or ``None``
            (default) for a symbolic batch — one artifact, any N.
        platforms: lowering targets; the artifact refuses to run
            anywhere else.  Lowering is ahead-of-time and
            device-independent: exporting for ``tpu`` needs no TPU.
        optimize / calibration: bake an optimized inference graph into
            the artifact (see :func:`build_serving_fn`).
    """
    forward = build_serving_fn(checkpoint, n_classes, variant=variant,
                               image_size=image_size, optimize=optimize,
                               calibration=calibration,
                               calibration_percentile=calibration_percentile)
    return export_forward(forward, image_size=image_size,
                          batch_size=batch_size, platforms=platforms)


def export_forward(forward, image_size: int = 224, batch_size=None,
                   platforms=("cpu", "tpu")):
    """Export an already-built serving forward (see :func:`export_serving`).

    Split out so callers that still need the live ``forward`` afterwards
    (e.g. the CLI's ``--validate``) build the model and read the
    checkpoint exactly once.
    """
    import jax
    from jax import export as jexport

    if batch_size is None:
        batch, = jexport.symbolic_shape("batch")
    else:
        batch = int(batch_size)
    spec = jax.ShapeDtypeStruct((batch, image_size, image_size, 3),
                                np.uint8)
    return jexport.export(jax.jit(forward),
                          platforms=tuple(platforms))(spec)


def save_exported(exported, path, meta: dict | None = None) -> pathlib.Path:
    """Serialize an ``Exported`` to ``path`` (flatbuffer bytes).

    Atomic (temp file + rename, like ``checkpoint.py``): an interrupted
    export never leaves a truncated artifact where serving picks it up.

    ``meta`` (optional) is written to the :func:`metadata_path` sidecar —
    the serving config (:data:`METADATA_KEYS`) plus free-form provenance —
    making the pair a self-contained deployment bundle.  A stale sidecar
    from a previous export at the same path is removed when ``meta`` is
    ``None`` so it can never misconfigure the new artifact.
    """
    import json
    import os

    path = pathlib.Path(path)
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(exported.serialize())
    os.replace(tmp, path)
    side = metadata_path(path)
    if meta is not None:
        stmp = side.with_name(side.name + ".tmp")
        stmp.write_text(json.dumps(meta, indent=2, sort_keys=True) + "\n")
        os.replace(stmp, side)
    elif side.exists():
        side.unlink()
    return path


def assert_close_bf16(got, want, name: str = "") -> None:
    """Assert two forward outputs agree to bf16-compilation precision.

    The exported module and the live jit are independently compiled
    programs over bf16 model compute: their results differ by O(bf16
    eps) *relative to the output's scale*, and softmax amplifies a
    0.5%-relative logit wiggle into ~1% absolute score shifts.  One
    scale-aware bound — max |got - want| <= 1% of (1 + max |want|) —
    holds for logits, features, and scores alike; used by the CLI's
    ``--validate``, the drive, and the tests (single source of truth).
    """
    got = np.asarray(got)
    want = np.asarray(want)
    if got.shape != want.shape:
        raise AssertionError(f"{name}: shape mismatch "
                             f"{got.shape} != {want.shape}")
    bound = 1e-2 * (1.0 + np.abs(want).max(initial=0.0))
    diff = float(np.abs(got - want).max(initial=0.0))
    if not diff <= bound:    # NaN-safe: NaNs fail
        raise AssertionError(
            f"{name}: exported/live forward disagree beyond bf16 "
            f"tolerance (max abs diff {diff:.4g} > bound {bound:.4g})")


def load_serving(path):
    """Deserialize an exported artifact into a callable.

    Returns ``fn(images_uint8) -> (logits, features, scores)`` running
    on the local backend (which must be one of the artifact's export
    platforms).  The call is jittable and shape-specializes per batch
    size like any jax program.  ``fn.meta`` carries the bundle's
    serving-config sidecar (``{}`` if the artifact ships without one).
    """
    from jax import export as jexport

    exported = jexport.deserialize(pathlib.Path(path).read_bytes())

    def forward(images):
        return exported.call(images)

    forward.exported = exported
    forward.meta = read_metadata(path)
    return forward
