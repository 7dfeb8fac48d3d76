"""TF SavedModel export: serve the trained model from the TF ecosystem.

Beyond the reference's inventory (its pipeline ends at offline score
extraction, reference ``script/evaluate.py:82-149``) and a sibling of
:mod:`openset_imagenet_tpu.export`'s StableHLO bundle: this module lowers
the same serving forward (``build_serving_fn``: uint8 ``[N, H, W, 3]`` →
``(logits, features, scores)``) through ``jax.experimental.jax2tf`` into
a **TensorFlow SavedModel**, the lingua franca of TF-Serving / Vertex /
TFLite-style deployment stacks.  Properties mirror the StableHLO bundle:

* weights baked in (no Python model code or checkpoint at the site),
* a **symbolic batch dimension** by default (``polymorphic_shapes``) —
  one SavedModel serves every batch size,
* named signature outputs (``logits`` / ``features`` / ``scores``) so
  TF-Serving clients address tensors by name,
* the same serving-config metadata (:data:`~openset_imagenet_tpu.export
  .METADATA_KEYS` + provenance) written as ``serving_config.json``
  inside the SavedModel directory — a complete deployment bundle.

TensorFlow is imported lazily: the rest of the package never pays the
import, and environments without TF simply cannot call these functions
(a clear ``ImportError`` explains why).  Inference through a loaded
SavedModel runs on the *TF* runtime — use the StableHLO bundle for
jax/PJRT serving hosts (e.g. the TPU serving daemon); this exporter
exists for sites standardized on TF interfaces.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

#: Filename of the serving-config metadata inside the SavedModel
#: directory.  TF loaders ignore unknown files in the bundle dir, so the
#: pair travels as one artifact (mirrors export.metadata_path's sidecar).
METADATA_NAME = "serving_config.json"

OUTPUT_NAMES = ("logits", "features", "scores")


def _tf():
    try:
        import tensorflow as tf
    except ImportError as e:   # pragma: no cover - env without TF
        raise ImportError(
            "SavedModel export needs the optional tensorflow dependency "
            "(the StableHLO exporter, openset_imagenet_tpu.export, has "
            "no such requirement)") from e
    return tf


def metadata_path(path) -> pathlib.Path:
    """Serving-config path inside a SavedModel directory."""
    return pathlib.Path(path) / METADATA_NAME


def read_metadata(path) -> dict:
    """Read a SavedModel bundle's serving config; ``{}`` if absent.

    Same degradation contract as ``export.read_metadata``: a missing or
    corrupt config means the caller supplies the serving configuration
    explicitly, not a failed load.
    """
    try:
        meta = json.loads(metadata_path(path).read_text())
    except (OSError, ValueError):
        return {}
    return meta if isinstance(meta, dict) else {}


def export_savedmodel(forward, out_dir, image_size: int = 224,
                      batch_size=None, meta: dict | None = None
                      ) -> pathlib.Path:
    """Write ``forward`` as a TF SavedModel at ``out_dir``.

    Args:
        forward: the pure serving function from
            :func:`~openset_imagenet_tpu.export.build_serving_fn`
            (weights captured), ``images_uint8 -> (logits, features,
            scores)``.
        out_dir: SavedModel directory (created/overwritten by TF).
        image_size: spatial geometry the model was trained with.
        batch_size: fix the batch dimension to this int, or ``None``
            (default) for a symbolic batch — one SavedModel, any N.
        meta: optional serving-config dict written to
            ``serving_config.json`` inside the bundle.

    Returns the bundle path.  The ``serving_default`` signature maps a
    uint8 ``images`` tensor to named ``logits``/``features``/``scores``
    outputs (float tensors), exactly the live predictor's forward.
    """
    tf = _tf()
    from jax.experimental import jax2tf

    if batch_size is None:
        poly = [f"(b, {image_size}, {image_size}, 3)"]
        sig_batch = None
    else:
        poly = None
        sig_batch = int(batch_size)
    tf_forward = jax2tf.convert(forward, polymorphic_shapes=poly)

    def serve(images):
        logits, features, scores = tf_forward(images)
        return {"logits": logits, "features": features, "scores": scores}

    module = tf.Module()
    module.serve = tf.function(
        serve, autograph=False,
        input_signature=[tf.TensorSpec(
            [sig_batch, image_size, image_size, 3], tf.uint8,
            name="images")])
    out_dir = pathlib.Path(out_dir)
    tf.saved_model.save(
        module, str(out_dir),
        signatures={"serving_default": module.serve.get_concrete_function()})
    if meta is not None:
        # Written after tf.saved_model.save (which owns the directory
        # contents); loaders that don't know the sidecar ignore it.
        metadata_path(out_dir).write_text(
            json.dumps(meta, indent=2, sort_keys=True) + "\n")
    return out_dir


def load_savedmodel(path):
    """Load a SavedModel bundle into ``fn(images) -> (logits, features,
    scores)`` numpy arrays (runs on the TF runtime).

    ``fn.meta`` carries the bundle's serving config (``{}`` if the
    bundle ships without one).  Used by the exporter's ``--validate``
    and the tests; production TF-Serving hosts load the directory with
    their own tooling and never import this package.
    """
    tf = _tf()

    loaded = tf.saved_model.load(str(path))
    sig = loaded.signatures["serving_default"]

    def forward(images):
        out = sig(images=tf.convert_to_tensor(np.asarray(images)))
        return tuple(np.asarray(out[name]) for name in OUTPUT_NAMES)

    forward.loaded = loaded
    forward.meta = read_metadata(path)
    return forward
