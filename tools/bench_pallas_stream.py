"""Pallas (Mosaic) vs XLA-fusion HBM streaming bandwidth microbench.

History (BENCH.md): round 2b measured Pallas streaming at ~160-290 GB/s
vs ~680 GB/s for XLA's fusion emitters; the round-3 re-measure with this
tool found PARITY at ≥51 MB operands (Pallas 885-908 vs XLA 787-990) —
yet the fused-backward blocks (experimental/fused_block.py) re-benched
unchanged (1324 vs 2624 imgs/s), so the residual blocker is the unified
multi-operand kernel structure and layout perturbation, not bandwidth.
Re-run on every toolchain bump (`--sweep`) and consult BENCH.md round-3
before re-attempting the kernels.

Measures, at a production-relevant shape (bf16 [8, 3136, 256] ~ stage-1
activations, ~12.8 MB/operand):

* xla_axpy      — y = a*x + b (2 reads + 1 write) via jit, XLA fusion
* xla_relu_mask — relu backward-ish: y = where(m>0, g, 0) (2r+1w)
* pallas_axpy   — same axpy as a Pallas grid kernel (double-buffered DMA)
* pallas_relu_mask

Prints one JSON line per case with aggregate GB/s (bytes moved / time).

Usage: python tools/bench_pallas_stream.py [--sweep] [--rows N] [--block-rows K]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


CHAIN = 32  # on-device iterations per dispatch (amortizes tunnel latency)


def chained(fn):
    """Loop ``y = fn(y, other)`` CHAIN times inside ONE dispatch.

    Per-dispatch kernels here are ~56 µs; through the tunneled PJRT
    backend dispatch latency would dominate (measured 35 GB/s when timed
    per-call), so the loop must live on device.  fori_loop iterations
    stay sequential — XLA cannot fuse across them, so every iteration
    really streams 2 reads + 1 write.
    """
    @jax.jit
    def run(x, other):
        def body(_, y):
            return fn(y, other)
        return jax.lax.fori_loop(0, CHAIN, body, x)

    return run


def bandwidth(fn, args, nbytes, iters=10, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)).ravel()[0])  # tunnel-safe sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)).ravel()[0])
    dt = time.perf_counter() - t0
    return nbytes * iters * CHAIN / dt / 1e9


def make_pallas_axpy(block_rows):
    from jax.experimental import pallas as pl

    def kernel(x_ref, b_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0009765625 + b_ref[...]

    @jax.jit
    def run(x, b):
        if x.shape[1] % block_rows:
            raise ValueError(
                f"rows {x.shape[1]} not divisible by block_rows "
                f"{block_rows}: the grid would silently drop the "
                "remainder and overstate bandwidth")
        n = x.shape[1] // block_rows
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((x.shape[0], block_rows, x.shape[2]),
                                   lambda i: (0, i, 0))] * 2,
            out_specs=pl.BlockSpec((x.shape[0], block_rows, x.shape[2]),
                                   lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x, b)

    return run


def make_pallas_relu_mask(block_rows):
    from jax.experimental import pallas as pl

    def kernel(g_ref, m_ref, o_ref):
        # f32 compare: Mosaic on this toolchain rejects bf16 compares
        # (round-2b finding, same workaround as experimental/fused_block).
        o_ref[...] = jnp.where(m_ref[...].astype(jnp.float32) > 0,
                               g_ref[...], 0)

    @jax.jit
    def run(g, m):
        if g.shape[1] % block_rows:
            raise ValueError(
                f"rows {g.shape[1]} not divisible by block_rows "
                f"{block_rows}: the grid would silently drop the "
                "remainder and overstate bandwidth")
        n = g.shape[1] // block_rows
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((g.shape[0], block_rows, g.shape[2]),
                                   lambda i: (0, i, 0))] * 2,
            out_specs=pl.BlockSpec((g.shape[0], block_rows, g.shape[2]),
                                   lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct(g.shape, g.dtype),
        )(g, m)

    return run


def run_shape(shape, block_rows):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    m = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    nbytes = 3 * x.size * 2  # 2 reads + 1 write, bf16

    cases = [
        ("xla_axpy", chained(lambda y, b: y * 1.0009765625 + b), (x, b)),
        ("xla_relu_mask",
         chained(lambda y, m: jnp.where(m > 0, y, 0)), (x, m)),
        ("pallas_axpy", chained(make_pallas_axpy(block_rows)), (x, b)),
        ("pallas_relu_mask",
         chained(make_pallas_relu_mask(block_rows)), (x, m)),
    ]
    for name, fn, fargs in cases:
        try:
            gbs = bandwidth(fn, fargs, nbytes)
            print(json.dumps({"case": name, "gb_per_s": round(gbs, 1),
                              "shape": list(shape), "dtype": "bf16"}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"case": name, "error": str(e)[:300]}),
                  flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=3136)
    ap.add_argument("--block-rows", type=int, default=392)
    ap.add_argument("--sweep", action="store_true",
                    help="sweep operand sizes 12.8 MB -> 205 MB")
    args = ap.parse_args()
    if args.sweep:
        for batch, rows in ((8, 3136), (8, 12544), (32, 12544)):
            run_shape((batch, rows, 256), args.block_rows)
    else:
        run_shape((8, args.rows, 256), args.block_rows)


if __name__ == "__main__":
    main()
