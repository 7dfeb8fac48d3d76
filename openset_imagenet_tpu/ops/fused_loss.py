"""Pallas TPU kernel: fused entropic open-set loss (forward + backward).

The reference computes this loss as separate softmax/log/gather/scatter ops
(reference ``losses.py:16-29`` + torch CE); the plain JAX version in
:mod:`openset_imagenet_tpu.ops.losses` leaves fusion to XLA.  This kernel
goes one step further and keeps the whole row-wise computation — masked
log-sum-exp, soft-target construction (one-hot for known rows, uniform
``w/C`` for negative rows), loss reduction, and the backward
``(sum targets) * softmax - targets`` — in VMEM with exactly one HBM read
of the logits per pass and no ``[B, C]`` intermediate ever materialised.

Semantics are identical to :func:`ops.losses.entropic_openset_loss`
(same ``(mean_loss, count)`` contract, mask-aware).  Gradient flows to the
logits only.  On non-TPU backends the kernel runs in interpreter mode, so
tests exercise the same code path everywhere.

Derivation: with targets ``t`` (one-hot or uniform ``w/C``) and
``p = softmax(logits)``, per-row loss ``L = -sum_c t_c * (l_c - lse(l))
= T * lse(l) - sum_c t_c l_c`` where ``T = sum_c t_c`` (1 for known rows,
``w`` for negative rows), and ``dL/dl_c = T * p_c - t_c``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(logits_ref, labels_ref, mask_ref, loss_ref, count_ref, *,
                unk_weight: float):
    # All per-row quantities stay [TB, 1] (2-D) — Mosaic rejects several
    # 1-D vector reductions ("Not implemented: Offset change").
    l = logits_ref[:].astype(jnp.float32)          # [TB, C]
    labels = labels_ref[:]                          # [TB, 1]
    mask = mask_ref[:].astype(jnp.float32)          # [TB, 1]
    tb, c = l.shape

    m = jnp.max(l, axis=-1, keepdims=True)          # [TB, 1]
    lse = m + jnp.log(jnp.sum(jnp.exp(l - m), axis=-1, keepdims=True))

    known = labels >= 0                             # [TB, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, c), 1)
    onehot_logit = jnp.sum(jnp.where(col == labels, l, 0.0), axis=-1,
                           keepdims=True)           # l_y
    uniform_dot = (unk_weight / c) * jnp.sum(l, axis=-1, keepdims=True)
    t_sum = jnp.where(known, 1.0, unk_weight)
    t_dot = jnp.where(known, onehot_logit, uniform_dot)
    row_loss = (t_sum * lse - t_dot) * mask         # [TB, 1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        loss_ref[0, 0] = 0.0
        count_ref[0, 0] = 0.0

    loss_ref[0, 0] += jnp.sum(row_loss)
    count_ref[0, 0] += jnp.sum(mask)


def _bwd_kernel(logits_ref, labels_ref, mask_ref, scale_ref, grad_ref, *,
                unk_weight: float):
    l = logits_ref[:].astype(jnp.float32)           # [TB, C]
    labels = labels_ref[:]                           # [TB, 1]
    mask = mask_ref[:].astype(jnp.float32)           # [TB, 1]
    scale = scale_ref[0, 0]                           # g / count
    tb, c = l.shape

    m = jnp.max(l, axis=-1, keepdims=True)
    e = jnp.exp(l - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)       # softmax

    known = labels >= 0                               # [TB, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, c), 1)
    onehot = (col == labels).astype(jnp.float32)
    targets = jnp.where(known, onehot, jnp.full_like(p, unk_weight / c))
    t_sum = jnp.where(known, 1.0, unk_weight)
    grad = (t_sum * p - targets) * (mask * scale)
    grad_ref[:] = grad.astype(grad_ref.dtype)


def _pad_rows(x, rows):
    pad = rows - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths)


def _fused_sums(logits, labels, mask, unk_weight):
    """(loss_sum, count) via the pallas forward kernel."""
    b, c = logits.shape
    tb = min(_BLOCK_ROWS, b)
    nb = pl.cdiv(b, tb)
    logits_p = _pad_rows(logits, nb * tb)
    labels_p = _pad_rows(labels, nb * tb).reshape(-1, 1)
    mask_p = _pad_rows(mask.astype(jnp.float32), nb * tb).reshape(-1, 1)

    loss, count = pl.pallas_call(
        functools.partial(_fwd_kernel, unk_weight=float(unk_weight)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        interpret=_interpret(),
    )(logits_p, labels_p, mask_p)
    return loss[0, 0], count[0, 0]


def _fused_grad(logits, labels, mask, scale, unk_weight):
    """d(loss_sum)/d(logits) * scale via the pallas backward kernel."""
    b, c = logits.shape
    tb = min(_BLOCK_ROWS, b)
    nb = pl.cdiv(b, tb)
    logits_p = _pad_rows(logits, nb * tb)
    labels_p = _pad_rows(labels, nb * tb).reshape(-1, 1)
    mask_p = _pad_rows(mask.astype(jnp.float32), nb * tb).reshape(-1, 1)
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)

    grad = pl.pallas_call(
        functools.partial(_bwd_kernel, unk_weight=float(unk_weight)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * tb, c), logits.dtype),
        interpret=_interpret(),
    )(logits_p, labels_p, mask_p, scale_arr)
    return grad[:b]


# --------------------------------------------------------------------------
# Weighted hard-target cross-entropy kernels (softmax-ignore & garbage)
# --------------------------------------------------------------------------
# Both remaining regimes are per-row-weighted CE with one-hot targets:
# softmax uses weight 1 for labels >= 0 and 0 otherwise (torch's
# ignore_index normalization); garbage uses the class weight of each row's
# label.  loss = sum_i r_i (lse_i - l_{i,y}) / sum_i r_i ;
# d/dl = r_i (softmax - onehot) * scale.


def _ce_fwd_kernel(logits_ref, labels_ref, weight_ref, loss_ref, wsum_ref):
    l = logits_ref[:].astype(jnp.float32)
    labels = labels_ref[:]
    r = weight_ref[:].astype(jnp.float32)
    tb, c = l.shape
    m = jnp.max(l, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(l - m), axis=-1, keepdims=True))
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, c), 1)
    l_y = jnp.sum(jnp.where(col == labels, l, 0.0), axis=-1, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        loss_ref[0, 0] = 0.0
        wsum_ref[0, 0] = 0.0

    loss_ref[0, 0] += jnp.sum(r * (lse - l_y))
    wsum_ref[0, 0] += jnp.sum(r)


def _ce_bwd_kernel(logits_ref, labels_ref, weight_ref, scale_ref, grad_ref):
    l = logits_ref[:].astype(jnp.float32)
    labels = labels_ref[:]
    r = weight_ref[:].astype(jnp.float32)
    scale = scale_ref[0, 0]
    tb, c = l.shape
    m = jnp.max(l, axis=-1, keepdims=True)
    e = jnp.exp(l - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, c), 1)
    onehot = (col == labels).astype(jnp.float32)
    grad_ref[:] = ((p - onehot) * (r * scale)).astype(grad_ref.dtype)


def _ce_sums(logits, labels, row_weights):
    b, c = logits.shape
    tb = min(_BLOCK_ROWS, b)
    nb = pl.cdiv(b, tb)
    safe_labels = jnp.clip(labels, 0, c - 1)
    logits_p = _pad_rows(logits, nb * tb)
    labels_p = _pad_rows(safe_labels, nb * tb).reshape(-1, 1)
    weights_p = _pad_rows(row_weights.astype(jnp.float32),
                          nb * tb).reshape(-1, 1)
    loss, wsum = pl.pallas_call(
        _ce_fwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        interpret=_interpret(),
    )(logits_p, labels_p, weights_p)
    return loss[0, 0], wsum[0, 0]


def _ce_grad(logits, labels, row_weights, scale):
    b, c = logits.shape
    tb = min(_BLOCK_ROWS, b)
    nb = pl.cdiv(b, tb)
    safe_labels = jnp.clip(labels, 0, c - 1)
    logits_p = _pad_rows(logits, nb * tb)
    labels_p = _pad_rows(safe_labels, nb * tb).reshape(-1, 1)
    weights_p = _pad_rows(row_weights.astype(jnp.float32),
                          nb * tb).reshape(-1, 1)
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    grad = pl.pallas_call(
        _ce_bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * tb, c), logits.dtype),
        interpret=_interpret(),
    )(logits_p, labels_p, weights_p, scale_arr)
    return grad[:b]


@jax.custom_vjp
def _weighted_ce_fused(logits, labels, row_weights):
    """(mean, weight_sum) of weighted hard-target CE, denominator = Σr."""
    loss_sum, wsum = _ce_sums(logits, labels, row_weights)
    return loss_sum / jnp.maximum(wsum, 1e-12), wsum


def _wce_fwd(logits, labels, row_weights):
    loss_sum, wsum = _ce_sums(logits, labels, row_weights)
    mean = loss_sum / jnp.maximum(wsum, 1e-12)
    return (mean, wsum), (logits, labels, row_weights, wsum)


def _wce_bwd(residuals, cotangents):
    logits, labels, row_weights, wsum = residuals
    g_mean, _ = cotangents
    scale = g_mean / jnp.maximum(wsum, 1e-12)
    return _ce_grad(logits, labels, row_weights, scale), None, None


_weighted_ce_fused.defvjp(_wce_fwd, _wce_bwd)


def softmax_loss_fused(logits, labels, sample_mask=None):
    """Fused CE with ignore(label < 0) — parity with ops.losses.softmax_loss.

    Note the mean denominator is the valid-row count (matching torch's
    ``ignore_index`` normalization), so ``(mean, count)`` semantics equal
    the unfused version exactly.
    """
    mask = (jnp.ones(labels.shape, jnp.float32) if sample_mask is None
            else sample_mask.astype(jnp.float32))
    row_w = (labels >= 0).astype(jnp.float32) * mask
    return _weighted_ce_fused(logits, labels, row_w)


def garbage_loss_fused(logits, labels, class_weights, sample_mask=None):
    """Fused class-weighted CE — parity with ops.losses.garbage_loss."""
    mask = (jnp.ones(labels.shape, jnp.float32) if sample_mask is None
            else sample_mask.astype(jnp.float32))
    c = logits.shape[-1]
    safe = jnp.clip(labels, 0, c - 1)
    row_w = class_weights.astype(jnp.float32)[safe] * mask
    return _weighted_ce_fused(logits, labels, row_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def entropic_openset_loss_fused(logits, labels, sample_mask,
                                unk_weight: float = 1.0):
    """Fused-mean entropic open-set loss: ``(mean_loss, count)``.

    Drop-in for :func:`ops.losses.entropic_openset_loss` with the mask
    required (pass ``jnp.ones`` for unpadded batches).
    """
    loss_sum, count = _fused_sums(logits, labels, sample_mask, unk_weight)
    return loss_sum / jnp.maximum(count, 1.0), count


def _vjp_fwd(logits, labels, sample_mask, unk_weight):
    loss_sum, count = _fused_sums(logits, labels, sample_mask, unk_weight)
    mean = loss_sum / jnp.maximum(count, 1.0)
    return (mean, count), (logits, labels, sample_mask, count)


def _vjp_bwd(unk_weight, residuals, cotangents):
    logits, labels, sample_mask, count = residuals
    g_mean, _ = cotangents  # count is integer-like; no gradient
    scale = g_mean / jnp.maximum(count, 1.0)
    grad = _fused_grad(logits, labels, sample_mask, scale, unk_weight)
    return grad, None, None


entropic_openset_loss_fused.defvjp(_vjp_fwd, _vjp_bwd)
