"""int8 vs bf16 MXU probe on v5e via XLA: matmul, conv, and conv rewrites.

BENCH.md round-3 addendum records the results (int8 matmul 1.8x, 1x1-as-dot
1.6x, 3x3 conv 0.67x, shift-and-dot 0.36x -> int8 serving judged marginal).
Re-run on toolchain bumps before reconsidering an int8 inference mode.
TPU-only; chained dispatches amortize tunnel latency (CLAUDE.md).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)).ravel()[0])

def bench(fn, args, iters=8, chain=4):
    @jax.jit
    def run(*a):
        def body(_, c):
            return fn(c, *a[1:])
        return jax.lax.fori_loop(0, chain, body, a[0])
    out = run(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    sync(out)
    return (time.perf_counter() - t0) / (iters * chain)

rng = np.random.default_rng(0)

# --- matmul 8192^3 ---
n = 8192
flops = 2 * n**3
a8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
b8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
abf = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
bbf = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

def mm_i8(x, b):
    y = jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y >> 8).astype(jnp.int8)  # requantize-ish to keep dtype stable

def mm_bf(x, b):
    y = jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y * 0.001).astype(jnp.bfloat16)

for name, fn, args in [("mm_bf16", mm_bf, (abf, bbf)),
                       ("mm_int8", mm_i8, (a8, b8))]:
    try:
        dt = bench(fn, args)
        print(name, f"{flops/dt/1e12:.1f} TFLOP/s ({dt*1e3:.1f} ms)",
              flush=True)
    except Exception as e:
        print(name, "ERROR", str(e)[:200], flush=True)

# --- conv: stage-2-like 3x3, NHWC ---
B, H, W, C = 256, 28, 28, 128
x8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
k8 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)
xbf = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
kbf = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.bfloat16)
cflops = 2 * B * H * W * 9 * C * C

def conv_i8(x, k):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y >> 8).astype(jnp.int8)

def conv_bf(x, k):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y * 0.01).astype(jnp.bfloat16)

for name, fn, args in [("conv_bf16", conv_bf, (xbf, kbf)),
                       ("conv_int8", conv_i8, (x8, k8))]:
    try:
        dt = bench(fn, args)
        print(name, f"{cflops/dt/1e12:.1f} TFLOP/s ({dt*1e3:.2f} ms)",
              flush=True)
    except Exception as e:
        print(name, "ERROR", str(e)[:200], flush=True)

# --- conv rewrites + HLO check (probe 2) ---

B, H, W = 256, 28, 28

# --- 1x1 conv as dot: [B*H*W, 512] @ [512, 512] (stage-3-ish) ---
Ci, Co = 512, 512
x8 = jnp.asarray(rng.integers(-127, 127, (B * H * W, Ci)), jnp.int8)
w8 = jnp.asarray(rng.integers(-127, 127, (Ci, Co)), jnp.int8)
xb = jnp.asarray(rng.standard_normal((B * H * W, Ci)), jnp.bfloat16)
wb = jnp.asarray(rng.standard_normal((Ci, Co)), jnp.bfloat16)
pflops = 2 * B * H * W * Ci * Co

def pw_i8(x, w):
    y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y >> 8).astype(jnp.int8)

def pw_bf(x, w):
    y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y * 0.01).astype(jnp.bfloat16)

for name, fn, args, fl in [("pw_bf16", pw_bf, (xb, wb), pflops),
                           ("pw_int8", pw_i8, (x8, w8), pflops)]:
    try:
        dt = bench(fn, args)
        print(name, f"{fl/dt/1e12:.1f} TFLOP/s ({dt*1e3:.2f} ms)",
              flush=True)
    except Exception as e:
        print(name, "ERROR", str(e)[:200], flush=True)

# --- 3x3 conv as 9 shifted int8 dots, int32 accumulate ---
C = 128
x4 = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
k4 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)
x4b = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
k4b = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.bfloat16)
cflops = 2 * B * H * W * 9 * C * C

def shiftdot(x, k):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B, H, W, C), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            acc = acc + jax.lax.dot_general(
                win, k[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    return (acc >> 8).astype(jnp.int8)

for name, fn, args in [("conv3_bf16", conv_bf, (x4b, k4b)),
                       ("conv3_shiftdot_i8", shiftdot, (x4, k4))]:
    try:
        dt = bench(fn, args)
        print(name, f"{cflops/dt/1e12:.1f} TFLOP/s ({dt*1e3:.2f} ms)",
              flush=True)
    except Exception as e:
        print(name, "ERROR", str(e)[:200], flush=True)

# HLO check: does the int8 pointwise dot survive as a dot?
hlo = jax.jit(pw_i8).lower(x8, w8).compile().as_text()
nd = hlo.count(" dot(")
nc = hlo.count(" convolution(")
print(f"pw_int8 HLO: {nd} dot, {nc} convolution", flush=True)
