"""Capture a jax.profiler trace of the train step for perf attribution.

Usage: python bench_profile.py [outdir] [ghost] [batch] [fused]
       (fused: 1/true enables model.fused_blocks; default off)
Then:  python tools/parse_trace.py <outdir>
"""

import sys

import jax

from bench_variants import build, time_step


def main(outdir="/tmp/osi_trace", ghost=64, batch=256, fused="0"):
    fused_on = str(fused).lower() in ("1", "true", "yes", "fused")
    state, step, arrays = build(int(batch), ghost=int(ghost),
                                fused_blocks=fused_on)
    # Warm up + compile outside the trace window.
    rate, state = time_step(state, step, arrays, int(batch), steps=5,
                            warmup=3, repeats=1)
    print(f"warm rate {rate:.1f} imgs/s; tracing...", flush=True)
    with jax.profiler.trace(outdir):
        for _ in range(4):
            state, m = step(state, *arrays)
        float(m["loss_sum"])
    print(f"trace written to {outdir}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
