"""Int8 quantized convolution for the PTQ inference graph.

TPU MXUs execute int8 x int8 -> int32 matmuls at twice the bf16 rate
(v5e: ~394 TOPS int8 vs ~197 TFLOP/s bf16) and int8 activations halve
the HBM traffic of the serving forward, which is mixed HBM/MXU-bound at
batch 256 (BENCH.md round-4 serving-forward ceiling).  ``QuantConv``
is the building block of the post-training-quantized graph
(``ResNet50(quantized=True)``; see :mod:`openset_imagenet_tpu.optimize`
for calibration and parameter conversion).

Scheme (standard symmetric PTQ, the TPU-friendly one — no zero points,
so the MXU sees plain int8 operands):

- activations: per-tensor symmetric int8, scale from calibration
  (abs-max over calibration batches); quantize inline
  ``q = clip(round(x / s_in), -127, 127)``.
- weights: per-output-channel symmetric int8, ``s_w[c] =
  max|kernel[..., c]| / 127`` (no calibration needed — weights are
  known exactly).
- accumulate in int32 on the MXU, dequantize in the epilogue:
  ``y = acc * (s_in * s_w[c]) + bias`` (the folded batch-norm bias).

XLA fuses the inline quantize into the producer's epilogue and the
dequant+bias(+relu) into the conv's, so the int8 graph has the same
fusion shape as the bf16 one with half the activation bytes.

The reference has no quantization path (it serves the f32 training
graph via ``script/evaluate.py``); this is a deployment extension.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


class QuantConv(nn.Module):
    """Int8-quantized convolution with folded-BN bias (inference only).

    Drop-in for the folded graph's ``nn.Conv(use_bias=True)`` call sites:
    same constructor signature (``features, kernel_size`` positional;
    ``strides`` / ``padding`` / ``feature_group_count`` keywords) and the
    same auto-name slots, so the quantized parameter tree mirrors the
    folded one path-for-path (``kernel`` goes int8 and gains ``scale`` /
    ``inv_input_scale`` leaves; ``bias`` is unchanged).

    Parameters are PLACEHOLDER-initialized (zero kernels, unit scales):
    real values come from :func:`openset_imagenet_tpu.optimize.quantize_params`,
    never from training.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Any = "SAME"
    feature_group_count: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_features = x.shape[-1] // self.feature_group_count
        kernel = self.param("kernel", nn.initializers.zeros,
                            (kh, kw, in_features, self.features), jnp.int8)
        # Combined dequant scale s_in * s_w[c], per output channel.
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        # 1 / s_in: multiply (cheap) instead of divide in the hot path.
        inv_input_scale = self.param("inv_input_scale",
                                     nn.initializers.ones, (), jnp.float32)

        strides = self.strides
        if isinstance(strides, int):
            strides = (strides, strides)
        padding = self.padding
        if padding == "SAME" and (kh, kw) == (1, 1):
            padding = ((0, 0), (0, 0))  # SAME == VALID for 1x1

        q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv_input_scale),
                     -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            q, kernel, window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * scale + bias
        return y.astype(self.dtype)
