"""Fused-backward bottleneck block: block-level custom VJP + Pallas kernels.

Why this exists (measured, not assumed): the ResNet-50 train step on TPU v5e
is HBM-bandwidth-bound (BENCH.md round-2 study).  Trace ⨝ HLO attribution
shows the backward pass of the pointwise-conv/BN/ReLU chains is the largest
cost block: XLA materialises the pre-ReLU boundary sums, re-reads activation
tensors once per consumer fusion (dX conv, dW conv, dβ/dγ reduces), and
re-reads the full-size pre-activation just to recover ReLU masks.

This module restructures WHAT the backward pass reads and writes:

* the whole bottleneck block (reference ``model.py:5-39``'s torchvision
  ResNet-50 v1.5 bottleneck) becomes ONE ``jax.custom_vjp``;
* the forward saves the block input, the three raw conv outputs, and the
  boundary ReLU mask as ``int8`` (4x smaller than the bf16 pre-sum XLA
  would keep);
* the backward computes each pointwise-conv region — ReLU/BN backward
  elementwise, dβ/dγ-style channel sums, the data-grad matmul, the
  weight-grad matmul, and the residual-skip accumulation — in ONE Pallas
  pass over HBM (kernels below); the 3x3 conv keeps XLA's native vjp;
* batch-norm statistics enter as per-channel ``(mul, add)`` vectors whose
  gradients are returned as channel sums, so the ghost-statistics chain
  rule (``models/norm.py`` SubsetBatchNorm semantics) is handled exactly
  by JAX autodiff on a few-KB scalar graph outside the kernels.

Gradient identities used (per channel c, rows r; ``y = relu(z*mul+add)``):
  ``gp = g * (y>0)``; ``dmul = sum_r gp*z``; ``dadd = sum_r gp``;
  ``dz = gp*mul``; ``dx = dz @ W^T``; ``dW = x^T @ dz``.
BN statistics gradients follow from ``mul = scale/sqrt(var+eps)``,
``add = bias - mean*mul`` by the outer (autodiff'd) scalar graph.

Numerical layout matches the unfused model: bf16 elementwise affine/ReLU
(as ``SubsetBatchNorm``'s fold in ``models/norm.py``), bf16 MXU matmuls
with f32 accumulation, f32 parameter/statistics gradients.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bottleneck_fused", "ghost_stats", "masked_add_relu"]


@jax.custom_vjp
def masked_add_relu(a, b):
    """``relu(a + b)`` whose backward reads an int8 mask, not the sum.

    At every residual-block boundary the standard autodiff saves the
    pre-ReLU sum (a full-size bf16 tensor) and re-reads it in backward
    just to recover the ReLU gate.  Saving the gate itself as int8 makes
    the backward read 4x smaller there (+1/4x extra forward write) while
    leaving the rest of the graph — and therefore XLA's fusion and layout
    decisions — completely unchanged.  Arithmetically identical to
    ``nn.relu(a + b)`` including the tie at 0 (gate is ``sum > 0``).
    """
    return jnp.maximum(a + b, 0)


def _mar_fwd(a, b):
    s = a + b
    return jnp.maximum(s, 0), (s > 0).astype(jnp.int8)


def _mar_bwd(mask, g):
    gm = g * mask.astype(g.dtype)
    return gm, gm


masked_add_relu.defvjp(_mar_fwd, _mar_bwd)


def ghost_stats(zs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean/variance over all axes but the channel one.

    Identical formula to ``SubsetBatchNorm``'s statistics block in
    ``models/norm.py`` (fast variance, clamped at zero), on a
    leading-rows slice of the activation.
    """
    zs = zs.astype(jnp.float32)
    axes = tuple(range(zs.ndim - 1))
    mean = jnp.mean(zs, axis=axes)
    mean2 = jnp.mean(jnp.square(zs), axis=axes)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    return mean, var


# ---------------------------------------------------------------------------
# The unified backward kernel.
#
# One HBM pass computing, for a pointwise-conv site z_out = x_act @ W:
#   gp   = g * gate          gate = saved int8 mask  (boundary ReLU)
#                                 | (z*mul_o+add_o > 0)  (recomputed ReLU)
#   sums_o = [sum gp*z, sum gp]          (BN-out mul/add grads)
#   dz   = gp * mul_o
#   dxa  = dz @ W^T (+ ds skip-grad accumulation)
#   in_act:  xa = relu(x*mul_i+add_i);  gin = dxa * (xa>0)
#            dx = gin*mul_i;  sums_i = [sum gin*x, sum gin]
#   else:    xa = x;  dx = dxa
#   dW  += xa^T @ dz
# Statics: in_act, has_mask, has_ds, emit_gp.
# ---------------------------------------------------------------------------


def _bwd_kernel(*refs, in_act: bool, has_mask: bool, has_ds: bool,
                emit_gp: bool, out_dtype):
    it = iter(refs)
    g_ref = next(it)
    z_ref = next(it)
    mask_ref = next(it) if has_mask else None
    x_ref = next(it)
    ds_ref = next(it) if has_ds else None
    w_ref = next(it)
    mul_o_ref = next(it)
    add_o_ref = next(it)
    mul_i_ref = next(it) if in_act else None
    add_i_ref = next(it) if in_act else None
    dx_ref = next(it)
    gp_ref = next(it) if emit_gp else None
    dw_ref = next(it)
    sums_o_ref = next(it)
    sums_i_ref = next(it) if in_act else None
    dw_acc = next(it)
    so_acc = next(it)
    si_acc = next(it) if in_act else None

    i = pl.program_id(0)
    n = pl.num_programs(0)

    g = g_ref[:]
    z = z_ref[:]
    if has_mask:
        gp = g * mask_ref[:].astype(g.dtype)
    else:
        # Recompute the ReLU gate in the forward's own (low) precision so
        # the mask matches the forward bitwise; the COMPARISON runs in f32
        # (exact on upcast) because Mosaic v5e rejects bf16 cmpf.
        mul_b = mul_o_ref[:].astype(z.dtype)
        add_b = add_o_ref[:].astype(z.dtype)
        gate = (z * mul_b + add_b).astype(jnp.float32) > 0
        gp = jnp.where(gate, g, jnp.zeros_like(g))
    if emit_gp:
        gp_ref[:] = gp

    gp32 = gp.astype(jnp.float32)
    s_mul_o = jnp.sum(gp32 * z.astype(jnp.float32), axis=0, keepdims=True)
    s_add_o = jnp.sum(gp32, axis=0, keepdims=True)

    dz = (gp32 * mul_o_ref[:]).astype(out_dtype)
    dxa = jax.lax.dot_general(dz, w_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if has_ds:
        dxa = dxa + ds_ref[:].astype(jnp.float32)

    x = x_ref[:]
    if in_act:
        mul_ib = mul_i_ref[:].astype(x.dtype)
        add_ib = add_i_ref[:].astype(x.dtype)
        xa = jnp.maximum(x * mul_ib + add_ib, jnp.zeros_like(x))
        gin = jnp.where(xa.astype(jnp.float32) > 0, dxa, 0.0)
        dx_ref[:] = (gin * mul_i_ref[:]).astype(out_dtype)
        s_mul_i = jnp.sum(gin * x.astype(jnp.float32), axis=0, keepdims=True)
        s_add_i = jnp.sum(gin, axis=0, keepdims=True)
    else:
        xa = x
        dx_ref[:] = dxa.astype(out_dtype)

    dw = jax.lax.dot_general(xa.astype(out_dtype), dz,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        so_acc[:] = jnp.zeros_like(so_acc)
        if in_act:
            si_acc[:] = jnp.zeros_like(si_acc)

    dw_acc[:] += dw
    so_acc[:] += jnp.concatenate([s_mul_o, s_add_o], axis=0)
    if in_act:
        si_acc[:] += jnp.concatenate([s_mul_i, s_add_i], axis=0)

    @pl.when(i == n - 1)
    def _emit():
        dw_ref[:] = dw_acc[:]
        sums_o_ref[:] = so_acc[:]
        if in_act:
            sums_i_ref[:] = si_acc[:]


def _pick_tm(m: int, row_bytes: int, fixed_bytes: int) -> Optional[int]:
    """Largest power-of-two divisor of m, in [256, 2048], sized so the
    kernel's double-buffered row streams plus its fixed VMEM residents
    (weights, accumulators) fit a ~12 MB budget of the 16 MB VMEM."""
    budget = 12 * 1024 * 1024 - fixed_bytes
    tm = 1
    while m % (tm * 2) == 0 and tm < 2048:
        tm *= 2
    while tm > 256 and 2 * tm * row_bytes > budget:
        tm //= 2
    return tm if tm >= 256 and 2 * tm * row_bytes <= budget else None


def _bwd_ref(g, z, mask, x, ds, w, mul_o, add_o, mul_i, add_i, *,
             in_act: bool, emit_gp: bool, out_dtype):
    """jnp form of the kernel (shape-agnostic over [..., C]).

    The XLA path AND the correctness oracle for the Pallas path.  Works
    on the native (4D NHWC) tensors directly — no reshapes, so XLA keeps
    its conv-friendly layouts and no physical transposes appear.
    """
    lead = tuple(range(g.ndim - 1))
    if mask is not None:
        gp = g * mask.astype(g.dtype)
    else:
        mul_b = mul_o.astype(z.dtype)
        add_b = add_o.astype(z.dtype)
        gp = jnp.where((z * mul_b + add_b) > 0, g, jnp.zeros_like(g))
    gp32 = gp.astype(jnp.float32)
    s_mul_o = jnp.sum(gp32 * z.astype(jnp.float32), axis=lead)
    s_add_o = jnp.sum(gp32, axis=lead)
    dz = (gp32 * mul_o).astype(out_dtype)
    dxa = jax.lax.dot_general(dz, w, (((dz.ndim - 1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if ds is not None:
        dxa = dxa + ds.astype(jnp.float32)
    if in_act:
        mul_ib = mul_i.astype(x.dtype)
        add_ib = add_i.astype(x.dtype)
        xa = jnp.maximum(x * mul_ib + add_ib, 0)
        gin = jnp.where(xa > 0, dxa, 0.0)
        dx = (gin * mul_i).astype(out_dtype)
        s_mul_i = jnp.sum(gin * x.astype(jnp.float32), axis=lead)
        s_add_i = jnp.sum(gin, axis=lead)
    else:
        xa = x
        dx = dxa.astype(out_dtype)
        s_mul_i = s_add_i = None
    dw = jax.lax.dot_general(xa.astype(out_dtype), dz,
                             ((lead, lead), ((), ())),
                             preferred_element_type=jnp.float32)
    gp_out = gp if emit_gp else None
    return dx, gp_out, dw, (s_mul_o, s_add_o), (s_mul_i, s_add_i)


def _bwd_pallas(g, z, mask, x, ds, w, mul_o, add_o, mul_i, add_i, *,
                in_act: bool, emit_gp: bool, out_dtype, interpret: bool):
    orig = (g, z, mask, x, ds)
    g_shape, x_shape = g.shape, x.shape
    _f = _flat
    g, z, x = _f(g), _f(z), _f(x)
    mask = _f(mask) if mask is not None else None
    ds = _f(ds) if ds is not None else None
    m, co = g.shape
    ci = x.shape[1]
    has_mask = mask is not None
    has_ds = ds is not None
    # Per-row bytes across every double-buffered stream, and the fixed
    # VMEM residents (weights + f32 accumulators + intermediates).
    bpr = (co * g.dtype.itemsize * (2 + emit_gp) + co * has_mask +
           x.dtype.itemsize * (ci * (2 + has_ds)) + 8 * co + 8 * ci)
    fixed = ci * co * (w.dtype.itemsize + 8) + 64 * (ci + co)
    tm = _pick_tm(m, bpr, fixed)
    if tm is None:
        return _bwd_ref(*orig, w, mul_o, add_o, mul_i, add_i,
                        in_act=in_act, emit_gp=emit_gp, out_dtype=out_dtype)

    row = lambda i: (i, 0)
    fixed = lambda i: (0, 0)
    vec = lambda c: pl.BlockSpec((1, c), fixed)
    in_specs = [pl.BlockSpec((tm, co), row), pl.BlockSpec((tm, co), row)]
    args = [g, z]
    if has_mask:
        in_specs.append(pl.BlockSpec((tm, co), row))
        args.append(mask)
    in_specs.append(pl.BlockSpec((tm, ci), row))
    args.append(x)
    if has_ds:
        in_specs.append(pl.BlockSpec((tm, ci), row))
        args.append(ds)
    in_specs += [pl.BlockSpec((ci, co), fixed), vec(co), vec(co)]
    args += [w, mul_o.reshape(1, co), add_o.reshape(1, co)]
    if in_act:
        in_specs += [vec(ci), vec(ci)]
        args += [mul_i.reshape(1, ci), add_i.reshape(1, ci)]

    out_specs = [pl.BlockSpec((tm, ci), row)]
    out_shape = [jax.ShapeDtypeStruct((m, ci), out_dtype)]
    if emit_gp:
        out_specs.append(pl.BlockSpec((tm, co), row))
        out_shape.append(jax.ShapeDtypeStruct((m, co), g.dtype))
    out_specs += [pl.BlockSpec((ci, co), fixed), pl.BlockSpec((2, co), fixed)]
    out_shape += [jax.ShapeDtypeStruct((ci, co), jnp.float32),
                  jax.ShapeDtypeStruct((2, co), jnp.float32)]
    if in_act:
        out_specs.append(pl.BlockSpec((2, ci), fixed))
        out_shape.append(jax.ShapeDtypeStruct((2, ci), jnp.float32))

    scratch = [pltpu.VMEM((ci, co), jnp.float32),
               pltpu.VMEM((2, co), jnp.float32)]
    if in_act:
        scratch.append(pltpu.VMEM((2, ci), jnp.float32))

    kern = functools.partial(_bwd_kernel, in_act=in_act, has_mask=has_mask,
                             has_ds=has_ds, emit_gp=emit_gp,
                             out_dtype=out_dtype)
    outs = pl.pallas_call(
        kern,
        grid=(m // tm,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)

    it = iter(outs)
    dx = next(it).reshape(x_shape)
    gp = next(it).reshape(g_shape) if emit_gp else None
    dw = next(it)
    so = next(it)
    si = next(it) if in_act else (None, None)
    sums_o = (so[0], so[1])
    sums_i = (si[0], si[1]) if in_act else (None, None)
    return dx, gp, dw, sums_o, sums_i


def _bwd_site(g, z, mask, x, ds, w, mul_o, add_o, mul_i=None, add_i=None, *,
              in_act: bool, emit_gp: bool, out_dtype, use_pallas: bool,
              interpret: bool = False):
    """Dispatch one pointwise-conv backward site to Pallas or jnp."""
    if use_pallas:
        return _bwd_pallas(g, z, mask, x, ds, w, mul_o, add_o, mul_i, add_i,
                           in_act=in_act, emit_gp=emit_gp,
                           out_dtype=out_dtype, interpret=interpret)
    return _bwd_ref(g, z, mask, x, ds, w, mul_o, add_o, mul_i, add_i,
                    in_act=in_act, emit_gp=emit_gp, out_dtype=out_dtype)


# ---------------------------------------------------------------------------
# Block-level custom VJP.
# ---------------------------------------------------------------------------


def _pw(x, w):
    """Pointwise (1x1) convolution as an MXU dot over the channel dim."""
    return jax.lax.dot_general(x, w, (((x.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=x.dtype)


def _conv3x3(xa, w, stride):
    return jax.lax.conv_general_dilated(
        xa, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=xa.dtype)


def _affine(z, mul, add):
    # bf16 elementwise affine, bit-matching SubsetBatchNorm's fold in
    # models/norm.py.
    return z * mul.astype(z.dtype) + add.astype(z.dtype)


def _block_fwd_math(x0, w1, w2, w3, wd, mul1, add1, mul2, add2, mul3, add3,
                    muld, addd, *, stride):
    dt = x0.dtype
    z1 = _pw(x0, w1.astype(dt))
    xa1 = jnp.maximum(_affine(z1, mul1, add1), 0)
    z2 = _conv3x3(xa1, w2.astype(dt), stride)
    xa2 = jnp.maximum(_affine(z2, mul2, add2), 0)
    z3 = _pw(xa2, w3.astype(dt))
    if wd is None:
        skip = x0
    else:
        x0s = x0[:, ::stride, ::stride, :]
        skip = _affine(_pw(x0s, wd.astype(dt)), muld, addd)
    pre = _affine(z3, mul3, add3) + skip
    out = jnp.maximum(pre, 0)
    mask = (pre > 0).astype(jnp.int8)
    return out, (z1, z2, z3, mask)


def _flat(t):
    return t.reshape(-1, t.shape[-1])


@functools.lru_cache(maxsize=None)
def _make_block_op(stride: int, downsample: bool, use_pallas: bool,
                   interpret: bool):
    """Build the custom-VJP bottleneck op for one static configuration."""

    def fwd_math(x0, w1, w2, w3, mul1, add1, mul2, add2, mul3, add3,
                 wd=None, muld=None, addd=None):
        return _block_fwd_math(x0, w1, w2, w3, wd, mul1, add1, mul2, add2,
                               mul3, add3, muld, addd, stride=stride)

    def fwd(x0, w1, w2, w3, mul1, add1, mul2, add2, mul3, add3,
            wd=None, muld=None, addd=None):
        out, (z1, z2, z3, mask) = fwd_math(
            x0, w1, w2, w3, mul1, add1, mul2, add2, mul3, add3,
            wd, muld, addd)
        res = (x0, z1, z2, z3, mask, w1, w2, w3, wd,
               mul1, add1, mul2, add2, mul3, muld)
        return out, res

    def bwd(res, g):
        (x0, z1, z2, z3, mask, w1, w2, w3, wd,
         mul1, add1, mul2, add2, mul3, muld) = res
        dt = x0.dtype
        g = g.astype(dt)
        site = functools.partial(_bwd_site, out_dtype=dt,
                                 use_pallas=use_pallas, interpret=interpret)

        # Tail: boundary ReLU + bn3 + conv3 dX/dW + bn2/relu2 backward.
        dz2, ds4, dw3, (dmul3, dadd3), (dmul2, dadd2) = site(
            g, z3, mask, z2, None,
            w3.astype(dt), mul3, jnp.zeros_like(mul3), mul2, add2,
            in_act=True, emit_gp=True)

        # Middle: the 3x3 convolution keeps XLA's native vjp.
        xa1 = jnp.maximum(_affine(z1, mul1, add1), 0)
        _, conv_vjp = jax.vjp(
            lambda xa, w: _conv3x3(xa, w, stride), xa1, w2.astype(dt))
        dxa1, dw2b = conv_vjp(dz2)

        # Head: bn1/relu1 backward + conv1 dX/dW (+ skip accumulation).
        ds_head = ds4 if not downsample else None
        dx0, _, dw1, (dmul1, dadd1), _ = site(
            dxa1, z1, None, x0, ds_head,
            w1.astype(dt), mul1, add1,
            in_act=False, emit_gp=False)

        grads = [dx0, dw1.astype(w1.dtype), dw2b.astype(w2.dtype),
                 dw3.astype(w3.dtype),
                 dmul1.astype(mul1.dtype), dadd1.astype(mul1.dtype),
                 dmul2.astype(mul2.dtype), dadd2.astype(mul2.dtype),
                 dmul3.astype(mul3.dtype), dadd3.astype(mul3.dtype)]

        if downsample:
            # Skip path through the (possibly strided) downsample conv +
            # BN: small site, XLA's own vjp handles it (the strided-slice
            # transpose lowers to an interior pad, NOT a scatter).
            def skip_fn(x0_, wd_, muld_, addd_):
                x0s = x0_[:, ::stride, ::stride, :]
                return _affine(_pw(x0s, wd_.astype(dt)), muld_, addd_)

            muld_f = muld
            _, skip_vjp = jax.vjp(skip_fn, x0, wd, muld_f,
                                  jnp.zeros_like(muld_f))
            dx0s, dwd, dmuld, daddd = skip_vjp(ds4)
            grads[0] = dx0 + dx0s
            grads += [dwd.astype(wd.dtype), dmuld.astype(muld.dtype),
                      daddd.astype(muld.dtype)]
        return tuple(grads)

    if downsample:
        @jax.custom_vjp
        def op(x0, w1, w2, w3, mul1, add1, mul2, add2, mul3, add3,
               wd, muld, addd):
            return fwd_math(x0, w1, w2, w3, mul1, add1, mul2, add2,
                            mul3, add3, wd, muld, addd)[0]
        op.defvjp(fwd, bwd)
    else:
        @jax.custom_vjp
        def op(x0, w1, w2, w3, mul1, add1, mul2, add2, mul3, add3):
            return fwd_math(x0, w1, w2, w3, mul1, add1, mul2, add2,
                            mul3, add3)[0]

        op.defvjp(fwd, bwd)
    return op


def bottleneck_fused(x0, w1, w2, w3, mul1, add1, mul2, add2, mul3, add3,
                     wd=None, muld=None, addd=None, *, stride: int = 1,
                     use_pallas: Optional[bool] = None,
                     interpret: bool = False):
    """Bottleneck block with a restructured, Pallas-fused backward pass.

    Args mirror the v1.5 bottleneck (reference torchvision block the
    reference model instantiates, ``model.py:11``): ``w1``/``w3`` are the
    pointwise kernels as ``[cin, cout]``; ``w2`` the ``[3,3,f,f]`` spatial
    kernel; ``mul*/add*`` the folded batch-norm affines (f32); ``wd``/
    ``muld``/``addd`` the optional downsample path.  Returns the block
    output; gradients flow to every input.
    """
    if use_pallas is None:
        # OSI_FUSED_BLOCK_BWD: jnp (default) | pallas.  The jnp backward
        # has identical math/dataflow and XLA's fusion emitters stream it
        # ~3x faster than Mosaic on the current toolchain (BENCH.md
        # round-2b study); the Pallas form is the opt-in, SINGLE-DEVICE
        # experiment (pallas_call has no GSPMD partitioning rule, so it
        # must not be auto-selected under a multi-device mesh).
        use_pallas = (os.environ.get("OSI_FUSED_BLOCK_BWD", "jnp")
                      == "pallas" and jax.device_count() == 1)
    op = _make_block_op(stride, wd is not None, bool(use_pallas),
                        bool(interpret))
    if wd is None:
        return op(x0, w1, w2, w3, mul1, add1, mul2, add2, mul3, add3)
    return op(x0, w1, w2, w3, mul1, add1, mul2, add2, mul3, add3,
              wd, muld, addd)
