"""Split-form tail-site backward == the unified jnp reference.

The split kernels (experimental/split_site.py) must compute exactly the
same tail-site gradients as ``fused_block._bwd_ref`` up to ONE documented
precision difference: ``dxa`` round-trips through HBM in the activation
dtype between K2 and K3 (the unified kernel keeps it f32 in VMEM).  The
tight comparison therefore runs against a jnp emulator that models that
round-trip bit-for-bit; a looser check against the unified reference
bounds the drift the round-trip introduces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_imagenet_tpu.experimental import fused_block as fb
from openset_imagenet_tpu.experimental.split_site import tail_site_split
from tests.test_fused_block import _site_inputs


def _split_ref(g, z, mask, x, w, mul_o, mul_i, add_i, out_dtype):
    """jnp emulation of the four split kernels, incl. the dxa round-trip."""
    gp = g * mask.astype(g.dtype)
    gp32 = gp.astype(jnp.float32)
    s_add_o = jnp.sum(gp32, axis=0)
    s_mul_o = jnp.sum(gp32 * z.astype(jnp.float32), axis=0)
    dz = (gp32 * mul_o).astype(out_dtype)
    dxa = jax.lax.dot_general(
        dz, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)
    xa = jnp.maximum(x * mul_i.astype(x.dtype) + add_i.astype(x.dtype), 0)
    gin = jnp.where(xa.astype(jnp.float32) > 0,
                    dxa.astype(jnp.float32), 0.0)
    dx = (gin * mul_i).astype(out_dtype)
    s_mul_i = jnp.sum(gin * x.astype(jnp.float32), axis=0)
    s_add_i = jnp.sum(gin, axis=0)
    dw = jax.lax.dot_general(xa.astype(out_dtype), dz,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dx, gp, dw, (s_mul_o, s_add_o), (s_mul_i, s_add_i)


def _assert_tuple_close(got, want, rtol, atol, tag):
    names = ["dx", "gp", "dw", "sums_o", "sums_i"]
    assert len(got) == len(want) == len(names)
    for name, s, r in zip(names, got, want):
        leaves_s, leaves_r = jax.tree.leaves(s), jax.tree.leaves(r)
        assert len(leaves_s) == len(leaves_r), name
        for ss, rr in zip(leaves_s, leaves_r):
            assert ss.shape == rr.shape, name
            np.testing.assert_allclose(
                np.asarray(ss, np.float32), np.asarray(rr, np.float32),
                rtol=rtol, atol=atol, err_msg=f"{tag}: {name} mismatch")


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_tail_site_split_matches_emulator_and_ref(dtype):
    m, ci, co = 512, 16, 24
    g, z, mask, x, _, w, mul_o, add_o, mul_i, add_i = _site_inputs(
        m, ci, co, dtype)

    split = tail_site_split(g, z, mask, x, w, mul_o, mul_i, add_i,
                            out_dtype=dtype, interpret=True)

    # Tight: the kernels == the jnp emulation of the same dataflow
    # (residual slack absorbs per-tile vs whole-array f32 sum ordering).
    emu = _split_ref(g, z, mask, x, w, mul_o, mul_i, add_i, dtype)
    tol = 1e-2 if dtype == jnp.bfloat16 else 1e-5
    _assert_tuple_close(split, emu, tol, tol, "vs emulator")

    # Loose: the dxa round-trip drift vs the unified f32-VMEM reference
    # stays bounded.
    ref = fb._bwd_ref(g, z, mask, x, None, w, mul_o,
                      jnp.zeros_like(mul_o), mul_i, add_i,
                      in_act=True, emit_gp=True, out_dtype=dtype)
    tol = 8e-2 if dtype == jnp.bfloat16 else 1e-5
    _assert_tuple_close(split, ref, tol, tol, "vs unified ref")
