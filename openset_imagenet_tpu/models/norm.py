"""Batch normalization with optional subset ("ghost") statistics.

Profiling the ResNet-50 train step on TPU v5e shows that the batch-norm
statistic reductions — full re-reads of every activation tensor from HBM —
account for ~half of step time (the convolutions themselves are MXU-bound
fusions).  ``stats_rows=G`` computes the batch mean/variance from only the
first ``G`` rows of the batch while still normalizing every row, cutting the
forward-stats HBM traffic by ``B/G``x.

With the global batch sharded over data-parallel devices this is also
methodologically closer to the reference: the reference's BN sees 64 samples
per step (``config/train.yaml:18``); a 256-batch DP run with
``stats_rows=64`` matches that statistics batch instead of quadrupling it.

``stats_rows=0`` (default) reduces over the full batch — numerically
identical to ``flax.linen.BatchNorm(use_fast_variance=True)``.

Multi-chip note: under a batch-sharded mesh the leading-rows slice lives on
the first data shard(s), so XLA broadcasts those statistics to the other
chips — correct, and verified to compile/execute under an 8-device mesh.
A per-device-stats variant (each chip normalizing with its own local rows,
torch's non-sync BN semantics) would avoid that broadcast via shard_map and
is left for a multi-chip tuning round.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


class BNAffine(nn.Module):
    """Parameter/statistics holder for externally computed BN statistics.

    Used by the fused-backward bottleneck (``experimental/fused_block.py``), where
    the ghost statistics are computed by the block itself (on the leading
    rows' pre-pass) and normalization is folded into per-channel
    ``(mul, add)`` vectors.  The variable layout (``scale``/``bias`` params,
    ``mean``/``var`` batch stats) matches ``SubsetBatchNorm`` and
    ``nn.BatchNorm`` exactly, so checkpoints are interchangeable between
    the fused and unfused block implementations.

    ``__call__(mean, var)`` (train) updates the running statistics and
    returns ``(mul, add)`` with ``mul = scale/sqrt(var+eps)`` and
    ``add = bias - mean*mul`` — the same fold as ``SubsetBatchNorm``
    below.  ``__call__()`` (eval) folds the running statistics.
    """

    features: int
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, mean=None, var=None):
        scale = self.param("scale", self.scale_init, (self.features,),
                           jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (self.features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (self.features,))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value +
                             (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value +
                            (1.0 - self.momentum) * var)
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        mul = inv * scale.astype(jnp.float32)
        add = bias.astype(jnp.float32) - mean * inv * scale.astype(
            jnp.float32)
        return mul, add


class SubsetBatchNorm(nn.Module):
    """BatchNorm whose batch statistics come from the leading rows only."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    stats_rows: int = 0  # 0 -> all rows
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (features,))
        scale = self.param("scale", self.scale_init, (features,),
                           self.param_dtype)
        bias = self.param("bias", self.bias_init, (features,),
                          self.param_dtype)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xs = x if self.stats_rows <= 0 else x[:self.stats_rows]
            xs = xs.astype(jnp.float32)
            axes = tuple(range(xs.ndim - 1))
            mean = jnp.mean(xs, axis=axes)
            # fast variance: E[x^2] - E[x]^2 (single fused pass over xs)
            mean2 = jnp.mean(jnp.square(xs), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1.0 - self.momentum) * var)

        y_dtype = self.dtype or x.dtype
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        mul = (inv * scale.astype(jnp.float32)).astype(y_dtype)
        add = (bias.astype(jnp.float32) -
               mean * inv * scale.astype(jnp.float32)).astype(y_dtype)
        return x.astype(y_dtype) * mul + add
