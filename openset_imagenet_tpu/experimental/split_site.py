"""Split-form Pallas backward for the pointwise-conv/BN/ReLU tail site.

BENCH.md round-3 recorded that Pallas streaming reaches XLA/HBM-spec
parity on this toolchain at >=51 MB operands (tools/bench_pallas_stream.py)
while the UNIFIED multi-operand backward kernel
(``experimental/fused_block.py``) still loses end to end — attributing the
residual loss to the multi-operand/multi-output kernel structure, not
bandwidth.  The recorded next experiment (CLAUDE.md open items) is to emit
the same backward as several lean streaming kernels, each moving at most
two large input streams and one large output stream.

This module is that experiment, scoped to the TAIL site — the hottest
attributed instance class in the production step ("1x1-conv data-grad +
BN dbeta/dgamma reduces", ~2.6 ms vs ~1.1 ms pure-bandwidth bound each,
BENCH.md round-2).  The tail-site math (identical to
``fused_block._bwd_ref`` with ``in_act=True, has_mask=True, has_ds=False,
emit_gp=True``):

    gp     = g * mask                       (boundary ReLU gate, int8)
    sums_o = [sum gp*z, sum gp]             (bn3 mul/add grads)
    dz     = gp * mul_o
    dxa    = dz @ W^T                       (1x1-conv data grad, MXU)
    xa     = relu(x*mul_i + add_i)          (bn2/relu2 recompute)
    gin    = dxa * (xa > 0)
    dx     = gin * mul_i
    sums_i = [sum gin*x, sum gin]
    dW     = xa^T @ dz                      (1x1-conv weight grad, MXU)

is emitted as FOUR kernels, each <=2 large reads + <=1 large write:

    K1 (g, mask)  -> gp        [+ sum-gp VMEM accumulation]
    K2 (gp, z)    -> dxa       [+ sum-gp*z accumulation; fixed W resident]
    K3 (dxa, x)   -> dx        [+ sums_i accumulation]
    K4 (gp, x)    -> (dW only) [VMEM-accumulated, written at last step]

Total HBM traffic is ~1.7x the unified kernel's (gp is re-read twice, x
once, and dxa round-trips), so this form wins only if lean-kernel
streaming efficiency more than compensates — exactly what
``tools/bench_split_site.py`` measures on the chip.  Measured result is
recorded in BENCH.md; the module stays under ``experimental/`` either way.

Precision matches the unified kernel except that ``dxa`` round-trips
through HBM in the activation dtype (the unified kernel keeps it f32 in
VMEM); parameter-gradient accumulators are f32 throughout.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openset_imagenet_tpu.experimental.fused_block import (
    _pick_tm as _pick_tm_or_none)

__all__ = ["tail_site_split"]


def _pick_tm(m: int, row_bytes: int, fixed_bytes: int) -> int:
    """``fused_block._pick_tm`` (one source of truth for the VMEM tile
    budget), but raising — this experiment has no jnp fallback path."""
    tm = _pick_tm_or_none(m, row_bytes, fixed_bytes)
    if tm is None:
        raise ValueError(f"no viable row tile for m={m} (row_bytes="
                         f"{row_bytes}, fixed={fixed_bytes})")
    return tm


def _k1_gate(g_ref, mask_ref, gp_ref, sadd_ref, acc):
    i = pl.program_id(0)
    gp = g_ref[:] * mask_ref[:].astype(g_ref.dtype)
    gp_ref[:] = gp

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jnp.sum(gp.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        sadd_ref[:] = acc[:]


def _k2_dxa(gp_ref, z_ref, w_ref, mul_o_ref, dxa_ref, smul_ref, acc, *,
            out_dtype):
    i = pl.program_id(0)
    gp32 = gp_ref[:].astype(jnp.float32)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jnp.sum(gp32 * z_ref[:].astype(jnp.float32), axis=0,
                      keepdims=True)
    dz = (gp32 * mul_o_ref[:]).astype(out_dtype)
    dxa_ref[:] = jax.lax.dot_general(
        dz, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        smul_ref[:] = acc[:]


def _k3_dx(dxa_ref, x_ref, mul_i_ref, add_i_ref, dx_ref, sums_ref, acc, *,
           out_dtype):
    i = pl.program_id(0)
    x = x_ref[:]
    mul_b = mul_i_ref[:].astype(x.dtype)
    add_b = add_i_ref[:].astype(x.dtype)
    xa = jnp.maximum(x * mul_b + add_b, jnp.zeros_like(x))
    dxa = dxa_ref[:].astype(jnp.float32)
    gin = jnp.where(xa.astype(jnp.float32) > 0, dxa, 0.0)
    dx_ref[:] = (gin * mul_i_ref[:]).astype(out_dtype)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jnp.concatenate(
        [jnp.sum(gin * x.astype(jnp.float32), axis=0, keepdims=True),
         jnp.sum(gin, axis=0, keepdims=True)], axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        sums_ref[:] = acc[:]


def _k4_dw(gp_ref, x_ref, mul_o_ref, mul_i_ref, add_i_ref, dw_ref, acc, *,
           out_dtype):
    i = pl.program_id(0)
    x = x_ref[:]
    mul_b = mul_i_ref[:].astype(x.dtype)
    add_b = add_i_ref[:].astype(x.dtype)
    xa = jnp.maximum(x * mul_b + add_b, jnp.zeros_like(x))
    dz = (gp_ref[:].astype(jnp.float32) * mul_o_ref[:]).astype(out_dtype)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(xa.astype(out_dtype), dz,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        dw_ref[:] = acc[:]


def tail_site_split(g, z, mask, x, w, mul_o, mul_i, add_i, *,
                    out_dtype=None, interpret: bool = False) -> Tuple:
    """Tail-site backward as four lean streaming kernels.

    Args match ``fused_block._bwd_site``'s tail configuration (``add_o``
    is unused there because the saved int8 mask already encodes the
    boundary gate).  Returns ``(dx, gp, dw, (s_mul_o, s_add_o),
    (s_mul_i, s_add_i))`` — the same tuple as ``fused_block._bwd_ref``.
    """
    out_dtype = out_dtype or g.dtype
    m, co = g.shape
    ci = x.shape[1]
    row = lambda i: (i, 0)
    fixed = lambda i: (0, 0)
    vec = lambda c: pl.BlockSpec((1, c), fixed)
    itemsize = jnp.dtype(g.dtype).itemsize
    call = functools.partial(
        pl.pallas_call,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret)

    # K1: gp = g * mask (+ sum gp)
    tm = _pick_tm(m, co * (2 * itemsize + 1), 4 * co)
    gp, s_add_o = call(
        _k1_gate,
        grid=(m // tm,),
        in_specs=[pl.BlockSpec((tm, co), row), pl.BlockSpec((tm, co), row)],
        out_specs=[pl.BlockSpec((tm, co), row), pl.BlockSpec((1, co), fixed)],
        out_shape=[jax.ShapeDtypeStruct((m, co), g.dtype),
                   jax.ShapeDtypeStruct((1, co), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, co), jnp.float32)],
    )(g, mask)

    # K2: dxa = (gp * mul_o) @ W^T (+ sum gp*z)
    tm = _pick_tm(m, (2 * co + ci) * itemsize,
                  ci * co * itemsize + 8 * co)
    k2 = functools.partial(_k2_dxa, out_dtype=out_dtype)
    dxa, s_mul_o = call(
        k2,
        grid=(m // tm,),
        in_specs=[pl.BlockSpec((tm, co), row), pl.BlockSpec((tm, co), row),
                  pl.BlockSpec((ci, co), fixed), vec(co)],
        out_specs=[pl.BlockSpec((tm, ci), row), pl.BlockSpec((1, co), fixed)],
        out_shape=[jax.ShapeDtypeStruct((m, ci), out_dtype),
                   jax.ShapeDtypeStruct((1, co), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, co), jnp.float32)],
    )(gp, z, w, mul_o.reshape(1, co))

    # K3: dx = gin * mul_i (+ sums_i)
    tm = _pick_tm(m, 3 * ci * itemsize, 16 * ci)
    k3 = functools.partial(_k3_dx, out_dtype=out_dtype)
    dx, sums_i = call(
        k3,
        grid=(m // tm,),
        in_specs=[pl.BlockSpec((tm, ci), row), pl.BlockSpec((tm, ci), row),
                  vec(ci), vec(ci)],
        out_specs=[pl.BlockSpec((tm, ci), row), pl.BlockSpec((2, ci), fixed)],
        out_shape=[jax.ShapeDtypeStruct((m, ci), out_dtype),
                   jax.ShapeDtypeStruct((2, ci), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, ci), jnp.float32)],
    )(dxa, x, mul_i.reshape(1, ci), add_i.reshape(1, ci))

    # K4: dW = xa^T @ dz (VMEM-accumulated, no large write)
    tm = _pick_tm(m, (co + ci) * itemsize,
                  ci * co * (4 + 4) + 8 * (ci + co))
    k4 = functools.partial(_k4_dw, out_dtype=out_dtype)
    dw = call(
        k4,
        grid=(m // tm,),
        in_specs=[pl.BlockSpec((tm, co), row), pl.BlockSpec((tm, ci), row),
                  vec(co), vec(ci), vec(ci)],
        out_specs=pl.BlockSpec((ci, co), fixed),
        out_shape=jax.ShapeDtypeStruct((ci, co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ci, co), jnp.float32)],
    )(gp, x, mul_o.reshape(1, co), mul_i.reshape(1, ci),
      add_i.reshape(1, ci))

    return (dx, gp, dw, (s_mul_o.reshape(co), s_add_o.reshape(co)),
            (sums_i[0], sums_i[1]))
