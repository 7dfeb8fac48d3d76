"""Inference-graph optimizations: batch-norm folding (int8 PTQ builds on it).

The reference serves the training graph as-is (it has no serving path at
all — ``script/evaluate.py`` stops at offline score extraction).  At
inference, batch normalisation is a per-channel affine map over running
statistics:

    bn(z) = (z - mean) * scale / sqrt(var + eps) + bias
          = z * inv + (bias - mean * inv),     inv = scale / sqrt(var+eps)

which is linear in ``z``, so it folds exactly into the preceding
convolution:  ``kernel' = kernel * inv`` (per output channel) and a bias
term ``bias' = bias - mean * inv``.  The folded graph
(``ResNet50(folded=True)``) has biased convolutions, identity norm slots
and an empty ``batch_stats`` collection — fewer parameter reads per
forward and, more importantly, the uniform conv(+bias)+relu structure the
int8 quantized path quantises per layer.

Folding commutes with every geometry knob that keeps the parameter tree
(variants 18–152, ResNeXt groups, Wide widths, the space-to-depth stem);
the experimental training-only flags (``fused_blocks``,
``boundary_mask``, ``dot_1x1``) are cleared — their checkpoints share the
same parameter layout, so their weights still fold.

Numerics: folding is done in float32 on the float32 parameters, so the
only divergence from the unfolded eval forward is bf16 rounding placement
(the unfolded graph rounds conv output before the affine; the folded one
rounds the folded kernel).  Tests bound it.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np

from .models.resnet import BN_EPSILON

# conv slot -> the batch-norm slot it feeds, within one module scope.
# Stable across the whole model zoo (CLAUDE.md conventions: BN layers are
# named bn1/bn2/bn3 in both nn.BatchNorm and SubsetBatchNorm forms).
_CONV_TO_BN = {
    "conv_init": "bn_init",          # stem (plain or space-to-depth)
    "Conv_0": "bn1",                 # bottleneck 1x1 / basic 3x3
    "Conv_1": "bn2",                 # bottleneck 3x3 / basic 3x3
    "Conv_2": "bn3",                 # bottleneck 1x1 (expansion)
    "downsample_conv": "downsample_bn",
}
_BN_TO_CONV = {v: k for k, v in _CONV_TO_BN.items()}


def _is_param_leaf_dict(d) -> bool:
    """True for a module's own param dict ({'kernel': arr, ...})."""
    return isinstance(d, dict) and d and all(
        not isinstance(v, dict) for v in d.values())


def _fold_pair(conv: dict, bn: dict, stats: dict, epsilon: float) -> dict:
    inv = (np.asarray(bn["scale"], np.float32)
           / np.sqrt(np.asarray(stats["var"], np.float32) + epsilon))
    kernel = np.asarray(conv["kernel"], np.float32) * inv  # out-chan last
    bias = (np.asarray(bn["bias"], np.float32)
            - np.asarray(stats["mean"], np.float32) * inv)
    if "bias" in conv:  # biased conv (never in our zoo, but exact anyway)
        bias = bias + np.asarray(conv["bias"], np.float32) * inv
    return {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}


def fold_batchnorm(params: Any, batch_stats: Any,
                   epsilon: float = BN_EPSILON) -> Any:
    """Fold every (conv, bn) pair; returns params for ``folded=True``.

    Walks the parameter tree scope by scope: a conv slot whose paired bn
    slot (``_CONV_TO_BN``) exists in the same scope absorbs that bn's
    running-statistics affine map; the bn slot disappears.  Scopes with
    no pairing (``fc``, ``logits``) pass through unchanged.  An unpaired
    bn slot means the tree drifted from the model zoo's naming — that is
    an error, not something to silently skip.
    """
    def fold_scope(p: dict, s: dict) -> dict:
        out = {}
        for key, val in p.items():
            if key in _CONV_TO_BN and _CONV_TO_BN[key] in p:
                bn_key = _CONV_TO_BN[key]
                if bn_key not in s:
                    raise ValueError(
                        f"no running statistics for {bn_key!r} — was this "
                        "state trained (batch_stats collection present)?")
                out[key] = _fold_pair(val, p[bn_key], s[bn_key], epsilon)
            elif key in _BN_TO_CONV:
                if _BN_TO_CONV[key] not in p:
                    raise ValueError(
                        f"batch-norm slot {key!r} has no paired conv "
                        f"{_BN_TO_CONV[key]!r} in its scope — the tree "
                        "does not match the model zoo's layout")
                continue  # consumed by its conv
            elif isinstance(val, dict) and not _is_param_leaf_dict(val):
                out[key] = fold_scope(val, s.get(key, {})
                                      if isinstance(s, dict) else {})
            else:
                out[key] = val
        return out

    return fold_scope(dict(params), dict(batch_stats))


def fold_model(model):
    """The ``folded=True`` twin of a training model (same geometry).

    Clears the experimental training-only flags — their checkpoints share
    the standard parameter layout, so their weights fold identically —
    and ghost-BN rows (there is no BN left to window).
    """
    return model.clone(folded=True, bn_stats_rows=0, dot_1x1=False,
                       fused_blocks=False, boundary_mask=False,
                       remat=False)


# ---------------------------------------------------------------------------
# Int8 post-training quantization (builds on the folded graph).

# Conv slots that quantize: the block convolutions.  The stem
# (conv_init) and the Dense heads (fc / logits) stay bf16 — the standard
# first/last-layer exemption (they carry a few % of the FLOPs but the
# bulk of the quantization-noise sensitivity).
_QUANT_SLOTS = frozenset({"Conv_0", "Conv_1", "Conv_2", "downsample_conv"})


def calibrate_amax(fmodel, fparams, batches,
                   percentile: float | None = None) -> dict:
    """Per-conv-input abs-max over calibration batches (activation scales).

    Runs the FOLDED model's forward with a flax method interceptor that
    records ``max|input|`` at every quantizing ``nn.Conv`` call site,
    keyed by the module path (``stage1_block1/Conv_0`` — exactly the
    parameter-tree path :func:`quantize_params` walks).  The interceptor
    collects traced values that the jitted wrapper returns, so the
    calibration forward runs COMPILED (one dispatch per batch — eager
    per-op dispatch through the TPU tunnel would take minutes).

    ``batches``: iterable of NHWC image batches — raw uint8 gets the
    serving preprocessing (``train._to_float``); float batches are
    assumed already preprocessed.  A few hundred images is plenty for
    abs-max calibration.

    ``percentile`` (e.g. ``99.9``) replaces each batch's abs-max with
    that percentile of |activation| — the standard outlier-robust PTQ
    clip (one extreme activation no longer stretches the whole tensor's
    scale; values above the clip saturate at +-127).  Batches combine
    by max either way.  Default (``None``) is exact abs-max.
    """
    import flax.linen as nn
    import jax

    if percentile is not None and not 0.0 < percentile <= 100.0:
        raise ValueError(f"percentile must be in (0, 100], got "
                         f"{percentile}")
    records = []

    def _site_stat(x):
        mag = jnp.abs(x.astype(jnp.float32))
        if percentile is None:
            return jnp.max(mag)
        return jnp.percentile(mag.reshape(-1), percentile)

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, nn.Conv)
                and context.method_name == "__call__"
                and mod.name in _QUANT_SLOTS):
            records.append(("/".join(mod.path), _site_stat(args[0])))
        return next_fun(*args, **kwargs)

    @jax.jit
    def run(batch):
        from .train import _to_float

        if batch.dtype == jnp.uint8:
            batch = _to_float(batch)
        records.clear()
        with nn.intercept_methods(interceptor):
            fmodel.apply({"params": fparams, "batch_stats": {}},
                         batch, train=False)
        return dict(records)

    amax: dict = {}
    n = 0
    for batch in batches:
        for key, val in jax.device_get(run(batch)).items():
            amax[key] = max(amax.get(key, 0.0), float(val))
        n += 1
    if not amax:
        raise ValueError("calibration saw no batches (or the model has "
                         "no quantizable conv slots)")
    return amax


def quantize_params(fparams: Any, amax: dict) -> Any:
    """Convert folded parameters to the int8 tree for ``quantized=True``.

    Symmetric scheme (models/quant.py): per-output-channel weight scales
    ``s_w[c] = max|kernel[..., c]| / 127`` and per-tensor activation
    scales ``s_in = amax / 127`` from :func:`calibrate_amax`.  Each
    quantizing conv slot's params become ``{kernel: int8, scale:
    s_in * s_w, bias, inv_input_scale: 1/s_in}``; everything else
    (stem, heads) passes through unchanged.
    """
    def walk(p: dict, prefix: Tuple[str, ...]) -> dict:
        out = {}
        for key, val in p.items():
            path = prefix + (key,)
            if key in _QUANT_SLOTS and _is_param_leaf_dict(val):
                pathstr = "/".join(path)
                if pathstr not in amax:
                    raise ValueError(
                        f"no calibration record for {pathstr!r} — was "
                        "calibrate_amax run on this model's folded twin?")
                if "bias" not in val:
                    raise ValueError(
                        f"{pathstr!r} has no bias — quantize the FOLDED "
                        "parameters (optimize.fold_batchnorm first)")
                s_in = max(amax[pathstr], 1e-8) / 127.0
                kernel = np.asarray(val["kernel"], np.float32)
                s_w = np.max(np.abs(kernel), axis=(0, 1, 2)) / 127.0
                s_w = np.maximum(s_w, 1e-12)  # dead channels
                kq = np.clip(np.rint(kernel / s_w), -127, 127)
                out[key] = {
                    "kernel": jnp.asarray(kq.astype(np.int8)),
                    "scale": jnp.asarray((s_in * s_w).astype(np.float32)),
                    "bias": jnp.asarray(val["bias"], jnp.float32),
                    "inv_input_scale": jnp.asarray(1.0 / s_in, jnp.float32),
                }
            elif isinstance(val, dict) and not _is_param_leaf_dict(val):
                out[key] = walk(val, path)
            else:
                out[key] = val
        return out

    return walk(dict(fparams), ())


def quantize_model(model):
    """The ``quantized=True`` twin of a training model (same geometry)."""
    return fold_model(model).clone(quantized=True)


def quantize_inference(model, state, calibration,
                       percentile: float | None = None
                       ) -> Tuple[Any, Any]:
    """Fold + calibrate + quantize a trained ``(model, TrainState)``.

    ``calibration``: iterable of image batches (serving preprocessing
    applied — for the standard pipeline that is raw NHWC uint8, which
    the forward normalizes on device) run through the folded graph to
    set activation scales.  Returns ``(qmodel, qstate)`` — a drop-in
    for :func:`~openset_imagenet_tpu.train.make_forward_step` like
    :func:`fold_inference`.
    """
    fmodel, fstate = fold_inference(model, state)
    amax = calibrate_amax(fmodel, fstate.params, calibration,
                          percentile=percentile)
    qmodel = quantize_model(model)
    qparams = quantize_params(fstate.params, amax)
    qstate = fstate.replace(params=qparams, apply_fn=qmodel.apply)
    return qmodel, qstate


def _default_image_loader(image_size: int):
    """Decode image paths with the serving reader policy — delegates to
    :func:`~openset_imagenet_tpu.train.decode_serving_paths`, the same
    decode every other serving surface applies, so calibration sees
    serving pixels."""
    def load(paths):
        from .train import decode_serving_paths

        batch, _ = decode_serving_paths(paths, image_size)
        return batch

    return load


def optimized_inference(model, state, mode: str, calibration=None,
                        image_size: int = 224,
                        load_images=None,
                        percentile: float | None = None
                        ) -> Tuple[Any, Any]:
    """Apply a named inference-graph optimization to a trained state.

    The one entry point every serving surface shares
    (``OpenSetPredictor(optimize=...)``, ``export_imagenet --optimize``,
    ``serve_imagenet --optimize``): ``mode`` is ``"fold_bn"`` or
    ``"int8"``; for int8, ``calibration`` is a uint8 ``[N, H, W, 3]``
    array or an iterable of image paths (decoded by ``load_images``,
    default: the serving reader policy at ``image_size``); ``percentile``
    optionally clips each activation scale to that percentile of
    |activation| instead of the abs-max (outlier-robust calibration, see
    :func:`calibrate_amax`).  Returns ``(opt_model, opt_state)``.
    """
    if mode == "fold_bn":
        return fold_inference(model, state)
    if mode != "int8":
        raise ValueError(f"unknown optimize mode {mode!r}; choose "
                         "'fold_bn' or 'int8'")
    if calibration is None:
        raise ValueError(
            "optimize='int8' needs calibration= (a uint8 image array "
            "or image paths) to set the activation scales")
    if getattr(model, "groups", 1) != 1:
        # Measured on v5e (BENCH.md round-4): XLA's grouped int8 conv
        # lowering inflates bytes ~2.5x and serves SLOWER than bf16
        # (resnext50: -19%).  Correctness is unaffected — warn, don't
        # refuse, so the knob stays usable on future toolchains.
        import logging

        logging.getLogger("openset_imagenet_tpu").warning(
            "int8 quantization of grouped convolutions (groups=%d) "
            "measured SLOWER than bf16 on the current TPU toolchain "
            "(BENCH.md round-4); prefer serving resnext* models "
            "unoptimized", model.groups)
    if isinstance(calibration, np.ndarray):
        images = calibration
    else:
        images = (load_images or _default_image_loader(image_size))(
            calibration)
    if images.shape[0] == 0:
        raise ValueError("optimize='int8': calibration is empty")
    if images.shape[1:3] != (image_size, image_size):
        raise ValueError(
            f"calibration images are {images.shape[1:3]}, the "
            f"model expects {(image_size, image_size)}")
    # Chunk so calibration reuses a couple of compiled shapes.
    chunks = [images[i:i + 64] for i in range(0, images.shape[0], 64)]
    if len(chunks) > 1 and chunks[-1].shape[0] != 64:
        chunks[-1] = images[-64:]  # full-size tail, no 2nd compile
    return quantize_inference(model, state, chunks,
                              percentile=percentile)


def fold_inference(model, state) -> Tuple[Any, Any]:
    """Fold a trained ``(model, TrainState)`` for serving.

    Returns ``(folded_model, folded_state)``: biased-conv parameters,
    empty ``batch_stats``, and ``apply_fn`` rebound to the folded module
    — a drop-in for :func:`~openset_imagenet_tpu.train.make_forward_step`
    (which reads ``state.apply_fn``).
    """
    fmodel = fold_model(model)
    fparams = fold_batchnorm(state.params, state.batch_stats)
    fstate = state.replace(params=fparams, batch_stats={},
                           apply_fn=fmodel.apply)
    return fmodel, fstate
