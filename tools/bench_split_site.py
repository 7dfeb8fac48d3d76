"""Tail-site backward microbench: XLA fusion vs unified vs split Pallas.

Settles the BENCH.md round-3 open question ("emit the backward as several
2-buffer streaming kernels rather than one unified kernel") at the SITE
level, isolated from the whole-model layout perturbation that already
costs the jnp-backward restructure ~330 imgs/s:

* ``xla_jnp``        — ``fused_block._bwd_ref`` under jit: XLA's own
                       multi-output fusion of the identical dataflow.
* ``pallas_unified`` — ``fused_block._bwd_pallas``: one kernel streaming
                       4 inputs + 2 outputs with 2 MXU dots.
* ``pallas_split``   — ``split_site.tail_site_split``: four lean kernels,
                       each <=2 large reads + 1 large write (~1.7x the
                       bytes, but each kernel in the streaming regime
                       where tools/bench_pallas_stream.py measured
                       XLA/HBM-spec parity).

Shape defaults to the production stage-1 tail site at batch 256:
m = 256*56*56 rows, co=256, ci=64, bf16 — the hottest attributed
instance class of the train step (~2.6 ms vs ~1.1 ms SOL, BENCH.md).

Each dispatch chains CHAIN site calls in a ``fori_loop`` whose carry
feeds ``gp -> g`` and ``dx -> x`` (tunnel-latency amortization + no DCE:
all small outputs fold into a scalar accumulator).  Timing syncs by
fetching that scalar (``block_until_ready`` is a no-op through the axon
tunnel).

Prints one JSON line per variant: ms per site call, nominal bytes, and
the implied GB/s.  Run ONLY on the real chip (serialize TPU processes,
never hard-kill — CLAUDE.md).
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from openset_imagenet_tpu.experimental import fused_block as fb
from openset_imagenet_tpu.experimental.split_site import tail_site_split

CHAIN = 8


def make_runner(site_fn):
    @jax.jit
    def run(g, x, z, mask, w, mul_o, mul_i, add_i):
        def body(_, carry):
            g, x, acc = carry
            dx, gp, dw, (smo, sao), (smi, sai) = site_fn(
                g, z, mask, x, w, mul_o, mul_i, add_i)
            acc = (acc + jnp.sum(dw) + jnp.sum(smo) + jnp.sum(sao) +
                   jnp.sum(smi) + jnp.sum(sai))
            return gp, dx, acc
        g2, x2, acc = jax.lax.fori_loop(
            0, CHAIN, body, (g, x, jnp.float32(0.0)))
        return acc

    return run


def site_bytes(m, ci, co, split):
    if split:
        reads = m * co * 3 + m * co * 4 + m * ci * 4 + (m * co * 2 +
                                                        m * ci * 2)
        writes = m * co * 2 + m * ci * 2 + m * ci * 2
    else:
        reads = m * co * 2 + m * co * 2 + m * co * 1 + m * ci * 2
        writes = m * co * 2 + m * ci * 2
    return reads + writes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ci", type=int, default=64)
    ap.add_argument("--co", type=int, default=256)
    args = ap.parse_args()

    m, ci, co = args.batch * 56 * 56, args.ci, args.co
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((m, co)), dt)
    z = jnp.asarray(rng.standard_normal((m, co)), dt)
    mask = jnp.asarray(rng.integers(0, 2, (m, co)), jnp.int8)
    x = jnp.asarray(rng.standard_normal((m, ci)), dt)
    w = jnp.asarray(rng.standard_normal((ci, co)) * 0.05, dt)
    mul_o = jnp.asarray(rng.standard_normal(co), jnp.float32)
    mul_i = jnp.asarray(rng.standard_normal(ci), jnp.float32)
    add_i = jnp.asarray(rng.standard_normal(ci), jnp.float32)
    fargs = (g, x, z, mask, w, mul_o, mul_i, add_i)

    zeros_o = jnp.zeros_like(mul_o)

    def ref_site(g, z, mask, x, w, mul_o, mul_i, add_i):
        return fb._bwd_ref(g, z, mask, x, None, w, mul_o, zeros_o,
                           mul_i, add_i, in_act=True, emit_gp=True,
                           out_dtype=dt)

    def uni_site(g, z, mask, x, w, mul_o, mul_i, add_i):
        return fb._bwd_pallas(g, z, mask, x, None, w, mul_o, zeros_o,
                              mul_i, add_i, in_act=True, emit_gp=True,
                              out_dtype=dt, interpret=False)

    def spl_site(g, z, mask, x, w, mul_o, mul_i, add_i):
        return tail_site_split(g, z, mask, x, w, mul_o, mul_i, add_i,
                               out_dtype=dt)

    cases = [("xla_jnp", ref_site, False),
             ("pallas_unified", uni_site, False),
             ("pallas_split", spl_site, True)]
    for name, site, split in cases:
        try:
            run = make_runner(site)
            acc = None
            for _ in range(2):
                acc = run(*fargs)
            a = float(acc)
            if not np.isfinite(a):
                raise RuntimeError(f"non-finite accumulator {a}")
            t0 = time.perf_counter()
            for _ in range(args.iters):
                acc = run(*fargs)
            a = float(acc)
            dt_s = time.perf_counter() - t0
            if not np.isfinite(a):
                raise RuntimeError(f"non-finite accumulator {a}")
            ms = dt_s / (args.iters * CHAIN) * 1e3
            nb = site_bytes(m, ci, co, split)
            print(json.dumps({
                "case": name, "ms_per_site": round(ms, 3),
                "nominal_gb": round(nb / 1e9, 3),
                "gb_per_s": round(nb / (ms / 1e3) / 1e9, 1),
                "m": m, "ci": ci, "co": co}), flush=True)
        except Exception as e:
            print(json.dumps({"case": name, "error": str(e)[:400]}),
                  flush=True)


if __name__ == "__main__":
    main()
