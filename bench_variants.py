"""Perf exploration harness: time train-step variants on the real chip.

Writes one JSON line per variant to stdout (flush immediately) so progress
is visible while running.  Variants are built from the same engine code as
bench.py; this file is a tuning tool, not the headline bench.

Usage: python bench_variants.py [variant ...]   (default: a standard sweep)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(batch: int, *, s2d=True, ghost=64, steps_mode="gspmd",
          n_classes=1000, fused_loss=False, remat=False, dot_1x1=False,
          fused_blocks=False, boundary_mask=False,
          model_variant="resnet50"):
    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.models.resnet import build_resnet

    model = build_resnet(model_variant, fc_layer_dim=n_classes,
                         out_features=n_classes, logit_bias=False,
                         space_to_depth=s2d, bn_stats_rows=ghost,
                         remat=remat, dot_1x1=dot_1x1,
                         fused_blocks=fused_blocks,
                         boundary_mask=boundary_mask)
    tx = engine.build_optimizer(
        NameSpace({"type": "adam", "lr": 1e-3, "decay": 0, "gamma": 1}), 1)
    state = engine.create_state(model, jax.random.PRNGKey(0), tx)
    loss_fn = engine.make_loss_fn("entropic", unk_weight=1.0,
                                  fused=fused_loss)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3),
                                      np.uint8))
    labels = jnp.asarray(rng.integers(-1, n_classes, batch).astype(np.int32))
    mask = jnp.ones((batch,), jnp.float32)
    if steps_mode == "shard_map":
        # Explicit-collective mode on a 1-chip mesh: quantifies the
        # per-device-BN path's single-chip overhead vs GSPMD.  Placement
        # via the production helper so the bench cannot drift from it.
        from openset_imagenet_tpu.parallel.mesh import make_mesh
        from openset_imagenet_tpu.parallel.shard_step import (
            make_train_step_shard_map, place_for_shard_map)
        mesh = make_mesh(num_devices=1)
        step = make_train_step_shard_map(loss_fn, mesh)
        state, (images, labels, mask) = place_for_shard_map(
            state, (images, labels, mask), mesh)
    else:
        step = engine.make_train_step(loss_fn, None)
    return state, step, (images, labels, mask)


def build_compiled(batch: int, compiler_options=None, **kw):
    """Lower + compile the step with explicit TPU compiler options."""
    state, step, arrays = build(batch, **kw)
    compiled = step.lower(state, *arrays).compile(
        compiler_options=compiler_options or {})
    return state, compiled, arrays


def run_variant_opts(name, batch, compiler_options, **kw):
    t0 = time.time()
    state, compiled, arrays = build_compiled(batch, compiler_options, **kw)
    rate, state = time_step(state, compiled, arrays, batch)
    emit(variant=name, batch=batch, imgs_per_sec=round(rate, 1),
         ms_per_step=round(1000.0 * batch / rate, 2),
         build_s=round(time.time() - t0, 1), opts=compiler_options)
    del state, compiled, arrays


def time_step(state, step, batch_arrays, batch, steps=20, warmup=4,
              repeats=3):
    for _ in range(warmup):
        state, m = step(state, *batch_arrays)
    float(m["loss_sum"])  # sync (block_until_ready is a no-op here)
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, *batch_arrays)
        # Unconditional fetch: this is the timing sync (block_until_ready is
        # a no-op through the tunnel) — never hide it inside an assert,
        # which python -O would strip.
        loss = float(m["loss_sum"])
        if not np.isfinite(loss):
            raise RuntimeError(f"non-finite loss during timing: {loss}")
        rates.append(batch * steps / (time.perf_counter() - t0))
    return float(np.median(rates)), state


def emit(**kw):
    print(json.dumps(kw), flush=True)


def run_variant(name, batch, **kw):
    t0 = time.time()
    state, step, arrays = build(batch, **kw)
    rate, state = time_step(state, step, arrays, batch)
    emit(variant=name, batch=batch, imgs_per_sec=round(rate, 1),
         ms_per_step=round(1000.0 * batch / rate, 2),
         build_s=round(time.time() - t0, 1), **{k: str(v) for k, v in kw.items()})
    del state, step, arrays


def time_forward(fwd, state, images, batch, steps=20, warmup=4, repeats=3):
    """Shared forward-timing protocol: warmup, scalar-fetch sync (the only
    reliable sync through the tunnel — block_until_ready is a no-op),
    finite check, median of ``repeats`` windows.  Returns imgs/sec."""
    for _ in range(warmup):
        logits, feats, scores = fwd(state, images)
    float(jnp.sum(scores[0]))
    rates = []
    for _ in range(repeats):
        t1 = time.perf_counter()
        for _ in range(steps):
            logits, feats, scores = fwd(state, images)
        s = float(jnp.sum(scores[0]))
        if not np.isfinite(s):
            raise RuntimeError(f"non-finite scores: {s}")
        rates.append(batch * steps / (time.perf_counter() - t1))
    return float(np.median(rates))


def run_forward(name, batch, **kw):
    """Inference path: eval-mode forward (the serving/extraction step)."""
    from openset_imagenet_tpu import train as engine

    t0 = time.time()
    state, _, arrays = build(batch, **kw)
    fwd = engine.make_forward_step()
    rate = time_forward(fwd, state, arrays[0], batch)
    emit(variant=name, batch=batch, imgs_per_sec=round(rate, 1),
         ms_per_step=round(1000.0 * batch / rate, 2),
         build_s=round(time.time() - t0, 1))
    del state, arrays


def run_eval(name, batch, **kw):
    """Validation step: eval-mode forward + loss + confidence sums."""
    from openset_imagenet_tpu import train as engine

    t0 = time.time()
    state, _, arrays = build(batch, **kw)
    loss_fn = engine.make_loss_fn("entropic", unk_weight=1.0)
    estep = engine.make_eval_step(loss_fn, "entropic", 1000)
    for _ in range(4):
        m = estep(state, *arrays)
    float(m["loss_sum"])  # sync
    rates = []
    for _ in range(3):
        t1 = time.perf_counter()
        for _ in range(20):
            m = estep(state, *arrays)
        s = float(m["loss_sum"])
        if not np.isfinite(s):
            raise RuntimeError(f"non-finite eval loss: {s}")
        rates.append(batch * 20 / (time.perf_counter() - t1))
    rate = float(np.median(rates))
    emit(variant=name, batch=batch, imgs_per_sec=round(rate, 1),
         ms_per_step=round(1000.0 * batch / rate, 2),
         build_s=round(time.time() - t0, 1))
    del state, arrays


def hlo_dump(path="/tmp/osi_step_hlo.txt", batch=256, **kw):
    """Dump the optimized HLO of the compiled step for fusion attribution."""
    state, step, arrays = build(batch, **kw)
    compiled = step.lower(state, *arrays).compile()
    text = compiled.as_text()
    with open(path, "w") as f:
        f.write(text)
    emit(variant="hlo_dump", path=path, chars=len(text))


def multistep(batch=256, k=10, **kw):
    """Diagnostic: K train steps inside one compiled fori_loop.

    Isolates per-dispatch overhead (significant through a tunneled PJRT
    backend): if K-steps-per-call is faster per step, dispatch latency is
    not fully hidden by async execution.
    """
    from openset_imagenet_tpu import train as engine

    state, _, arrays = build(batch, **kw)
    images, labels, mask = arrays
    loss_fn = engine.make_loss_fn("entropic", unk_weight=1.0)
    inner = engine.make_train_step(loss_fn, None)

    def k_steps(state, images, labels, mask):
        def body(_, s):
            s, _ = inner(s, images, labels, mask)
            return s
        return jax.lax.fori_loop(0, k, body, state)

    stepk = jax.jit(k_steps, donate_argnums=(0,))
    for _ in range(2):
        state = stepk(state, images, labels, mask)
    float(jax.tree.leaves(state.params)[0].ravel()[0])  # sync
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            state = stepk(state, images, labels, mask)
        float(jax.tree.leaves(state.params)[0].ravel()[0])
        rates.append(3 * k * batch / (time.perf_counter() - t0))
    emit(variant=f"multistep_k{k}", batch=batch,
         imgs_per_sec=round(float(np.median(rates)), 1),
         ms_per_step=round(1000.0 * batch / float(np.median(rates)), 2))


def run_forward_opts(name, batch, compiler_options, **kw):
    """Serving forward with explicit TPU compiler options (AOT-compiled)."""
    from openset_imagenet_tpu import train as engine

    t0 = time.time()
    state, _, arrays = build(batch, **kw)
    fwd = engine.make_forward_step()
    images = arrays[0]
    compiled = fwd.lower(state, images).compile(
        compiler_options=compiler_options or {})
    rate = time_forward(compiled, state, images, batch)
    emit(variant=name, batch=batch, imgs_per_sec=round(rate, 1),
         build_s=round(time.time() - t0, 1), opts=compiler_options)
    del state, compiled, arrays


def run_forward_cost(name, batch, **kw):
    """Serving-path ceiling: forward timing + its own cost analysis.

    Emits sustained GB/s (per-device cost-analysis bytes / measured step
    time — cost_analysis() is per-device for SPMD programs, bench.py:201)
    and effective TFLOP/s, so the inference path's boundedness is a
    measurement like the train step's (BENCH.md round-4).
    """
    from openset_imagenet_tpu import train as engine

    state, _, arrays = build(batch, **kw)
    fwd = engine.make_forward_step()
    images = arrays[0]
    # Guarded like bench.py:141-148 — cost_analysis() can fail on some
    # toolchains, and the throughput measurement must still land.
    ca = {}
    try:
        ca = fwd.lower(state, images).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
    except Exception:
        pass
    rate = time_forward(fwd, state, images, batch)
    step_s = batch / rate
    emit(variant=name, batch=batch, imgs_per_sec=round(rate, 1),
         ms_per_step=round(1000.0 * step_s, 2),
         bytes_per_step_gb=round(float(ca.get("bytes accessed", 0)) / 1e9,
                                 2),
         sustained_gbps=round(float(ca.get("bytes accessed", 0))
                              / step_s / 1e9, 0),
         tflops_effective=round(float(ca.get("flops", 0)) / step_s / 1e12,
                                1))
    del state, arrays


def run_forward_optimized(name, batch, optimize, model_variant="resnet50"):
    """Optimized serving graphs (optimize.py) vs the bf16 eval forward.

    ``fold_bn``: BN affine maps folded into the convs (expected ~parity —
    XLA already fuses the eval-mode affine into the conv epilogue; the
    fold's value is enabling int8).  ``int8``: symmetric PTQ of the block
    convs — int8 MXU matmuls (2x bf16 rate on v5e) and int8 activations
    (half the HBM bytes), targeting the 12.2k imgs/s mixed-bound serving
    ceiling (BENCH.md round-4).  Random weights/scales: the timed XLA
    program is identical to a trained model's.
    """
    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.models.resnet import build_resnet
    from openset_imagenet_tpu.optimize import (fold_inference,
                                               quantize_inference)

    t0 = time.time()
    model = build_resnet(model_variant, fc_layer_dim=1000,
                         out_features=1000,
                         logit_bias=False, space_to_depth=True,
                         bn_stats_rows=64)
    tx = engine.build_optimizer(
        NameSpace({"type": "adam", "lr": 1e-3, "decay": 0, "gamma": 1}), 1)
    state = engine.create_state(model, jax.random.PRNGKey(0), tx)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3),
                                      np.uint8))
    if optimize == "fold_bn":
        _, state = fold_inference(model, state)
    elif optimize == "int8":
        _, state = quantize_inference(model, state, [images])
    else:
        raise ValueError(optimize)
    fwd = engine.make_forward_step()
    ca = {}
    try:
        ca = fwd.lower(state, images).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
    except Exception:
        pass
    rate = time_forward(fwd, state, images, batch)
    step_s = batch / rate
    emit(variant=name, batch=batch, optimize=optimize,
         imgs_per_sec=round(rate, 1),
         ms_per_step=round(1000.0 * step_s, 2),
         bytes_per_step_gb=round(float(ca.get("bytes accessed", 0)) / 1e9,
                                 2),
         sustained_gbps=round(float(ca.get("bytes accessed", 0))
                              / step_s / 1e9, 0),
         tflops_effective=round(float(ca.get("flops", 0)) / step_s / 1e12,
                                1),
         build_s=round(time.time() - t0, 1))
    del state, images


def run_forward_artifact(name, batch, **kw):
    """Exported-artifact serving vs the live jitted forward, same chip.

    Round-trips the production forward through jax.export
    serialize/deserialize (exactly what export_imagenet.py ships) and
    times the deserialized call with the shared protocol — measures the
    deployment artifact's throughput cost relative to make_forward_step
    (expected ~0: same XLA program after recompilation).
    """
    from jax import export as jexport

    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.export import export_forward

    state, _, arrays = build(batch, **kw)
    images = arrays[0]
    live = engine.make_forward_step()
    rate_live = time_forward(live, state, images, batch)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def forward(imgs):
        x = imgs.astype(jnp.float32) * (1.0 / 255.0)
        logits, features = state.apply_fn(variables, x, train=False)
        return logits, features, jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1)

    t0 = time.time()
    exported = jexport.deserialize(
        export_forward(forward, batch_size=batch,
                       platforms=(jax.default_backend(),)).serialize())
    art = jax.jit(lambda s, imgs: exported.call(imgs))
    rate_art = time_forward(art, state, images, batch)
    emit(variant=name, batch=batch, imgs_per_sec=round(rate_art, 1),
         live_imgs_per_sec=round(rate_live, 1),
         artifact_vs_live=round(rate_art / rate_live, 3),
         export_s=round(time.time() - t0, 1))
    del state, arrays


def cost_analysis(batch=256, **kw):
    """Compile-time FLOP/byte analysis of the step (no execution)."""
    from openset_imagenet_tpu import train as engine
    state, step, arrays = build(batch, **kw)
    lowered = step.lower(state, *arrays)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    emit(variant="cost_analysis", batch=batch,
         flops=ca.get("flops"), bytes_accessed=ca.get("bytes accessed"),
         hbm_bytes=ca.get("bytes accessed0{}", None) or
         ca.get("bytes accessedout", None))
    return compiled


VARIANTS = {
    "base_s2d_ghost64": lambda: run_variant("base_s2d_ghost64", 256),
    "ghost32": lambda: run_variant("ghost32", 256, ghost=32),
    "ghost16": lambda: run_variant("ghost16", 256, ghost=16),
    "ghost0_full": lambda: run_variant("ghost0_full", 256, ghost=0),
    "no_s2d": lambda: run_variant("no_s2d", 256, s2d=False),
    "b128": lambda: run_variant("b128", 128),
    "b384": lambda: run_variant("b384", 384),
    "b512": lambda: run_variant("b512", 512),
    "fusedloss": lambda: run_variant("fusedloss", 256, fused_loss=True),
    "remat": lambda: run_variant("remat", 256, remat=True),
    "remat_ew": lambda: run_variant("remat_ew", 256, ghost=32,
                                    remat="elementwise"),
    "cost_ew": lambda: cost_analysis(ghost=32, remat="elementwise"),
    "dot1x1": lambda: run_variant("dot1x1", 256, ghost=32, dot_1x1=True),
    "dot1x1_g16": lambda: run_variant("dot1x1_g16", 256, ghost=16,
                                      dot_1x1=True),
    "cost_dot": lambda: cost_analysis(ghost=32, dot_1x1=True),
    "remat_g32": lambda: run_variant("remat_g32", 256, ghost=32,
                                     remat=True),
    "remat_g32_b512": lambda: run_variant("remat_g32_b512", 512, ghost=32,
                                          remat=True),
    "remat_full_bn": lambda: run_variant("remat_full_bn", 256, ghost=0,
                                         remat=True),
    "fwd_opt_lhs": lambda: run_forward_opts(
        "fwd_opt_lhs", 256,
        {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    "fwd_opt_vmem": lambda: run_forward_opts(
        "fwd_opt_vmem", 256, {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    "fwd_opt_both": lambda: run_forward_opts(
        "fwd_opt_both", 256,
        {"xla_tpu_enable_latency_hiding_scheduler": "true",
         "xla_tpu_scoped_vmem_limit_kib": "65536"}),
    "fwd_artifact": lambda: run_forward_artifact("fwd_artifact", 256),
    # Optimized serving graphs (optimize.py: BN fold / int8 PTQ).
    "fwd_fold256": lambda: run_forward_optimized("fwd_fold256", 256,
                                                 "fold_bn"),
    "fwd_int8_64": lambda: run_forward_optimized("fwd_int8_64", 64,
                                                 "int8"),
    "fwd_int8_256": lambda: run_forward_optimized("fwd_int8_256", 256,
                                                  "int8"),
    "fwd_int8_512": lambda: run_forward_optimized("fwd_int8_512", 512,
                                                  "int8"),
    "fwd_int8_1024": lambda: run_forward_optimized("fwd_int8_1024", 1024,
                                                   "int8"),
    # Grouped-conv family: MXU-utilization-bound in bf16 (BENCH.md
    # round-4 addendum), so int8's 2x MXU rate should bite harder.
    "fwd_rx50_256": lambda: run_forward("fwd_rx50_256", 256,
                                        model_variant="resnext50_32x4d"),
    "fwd_int8_rx50_256": lambda: run_forward_optimized(
        "fwd_int8_rx50_256", 256, "int8",
        model_variant="resnext50_32x4d"),
    "fwd_w50_256": lambda: run_forward("fwd_w50_256", 256,
                                       model_variant="wide_resnet50_2"),
    "fwd_int8_w50_256": lambda: run_forward_optimized(
        "fwd_int8_w50_256", 256, "int8",
        model_variant="wide_resnet50_2"),
    "fwd_cost64": lambda: run_forward_cost("fwd_cost64", 64),
    "fwd_cost128": lambda: run_forward_cost("fwd_cost128", 128),
    "fwd_cost256": lambda: run_forward_cost("fwd_cost256", 256),
    "fwd_cost512": lambda: run_forward_cost("fwd_cost512", 512),
    "fwd_cost1024": lambda: run_forward_cost("fwd_cost1024", 1024),
    "cost": lambda: cost_analysis(),
    "cost_remat": lambda: cost_analysis(ghost=32, remat=True),
    "opt_vmem": lambda: run_variant_opts(
        "opt_vmem", 256, {"xla_tpu_scoped_vmem_limit_kib": "65536"},
        ghost=32),
    "opt_lhs": lambda: run_variant_opts(
        "opt_lhs", 256, {"xla_tpu_enable_latency_hiding_scheduler": "true"},
        ghost=32),
    "opt_downcast": lambda: run_variant_opts(
        "opt_downcast", 256,
        {"xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true"},
        ghost=32),
    "opt_fcm": lambda: run_variant_opts(
        "opt_fcm", 256,
        {"xla_tpu_enable_experimental_fusion_cost_model": "true"}, ghost=32),
    "hlo": lambda: hlo_dump(ghost=32),
    "multistep": lambda: multistep(ghost=32),
    # Fused-backward bottleneck blocks (experimental/fused_block.py).
    "fusedblk": lambda: run_variant("fusedblk", 256, ghost=64,
                                    fused_blocks=True),
    "fusedblk_g32": lambda: run_variant("fusedblk_g32", 256, ghost=32,
                                        fused_blocks=True),
    "fusedblk_pallas": lambda: run_variant_env(
        "fusedblk_pallas", 256, {"OSI_FUSED_BLOCK_BWD": "pallas"},
        ghost=64, fused_blocks=True),
    "hlo_fusedblk": lambda: hlo_dump("/tmp/osi_step_hlo_fusedblk.txt",
                                     ghost=64, fused_blocks=True),
    "hlo_fusedblk_pallas": lambda: _with_env(
        {"OSI_FUSED_BLOCK_BWD": "pallas"}, hlo_dump,
        "/tmp/osi_step_hlo_fusedblk_pallas.txt", ghost=64,
        fused_blocks=True),
    "cost_fusedblk": lambda: cost_analysis(ghost=64, fused_blocks=True),
    # Inference/serving path: forward-only (logits/features/scores).
    "infer": lambda: run_forward("infer", 256),
    "infer_b512": lambda: run_forward("infer_b512", 512),
    # Validation pass: forward + loss + streaming confidence sums.
    "evalstep": lambda: run_eval("evalstep", 256),
    # Deeper variants (capability breadth beyond the reference's ResNet-50).
    "r101": lambda: run_variant("r101", 256, model_variant="resnet101"),
    "r152": lambda: run_variant("r152", 256, model_variant="resnet152"),
    "r152_b128": lambda: run_variant("r152_b128", 128, model_variant="resnet152"),
    # Grouped / wide families (torchvision constructor parity).
    "rx50": lambda: run_variant("rx50", 256,
                                model_variant="resnext50_32x4d"),
    "rx101": lambda: run_variant("rx101", 128,
                                 model_variant="resnext101_32x8d"),
    "w50": lambda: run_variant("w50", 256, model_variant="wide_resnet50_2"),
    "w101": lambda: run_variant("w101", 128,
                                model_variant="wide_resnet101_2"),
    "cost_rx50": lambda: cost_analysis(model_variant="resnext50_32x4d"),
    # Explicit-collective shard_map mode on one chip (per-device BN).
    "shardmap1": lambda: run_variant("shardmap1", 256,
                                     steps_mode="shard_map"),
    # int8 boundary-ReLU masks on the standard autodiff path.
    "bmask": lambda: run_variant("bmask", 256, ghost=64,
                                 boundary_mask=True),
    "bmask_g32": lambda: run_variant("bmask_g32", 256, ghost=32,
                                     boundary_mask=True),
    "cost_bmask": lambda: cost_analysis(ghost=64, boundary_mask=True),
}


def _with_env(env, fn, *args, **kw):
    import os
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        return fn(*args, **kw)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def run_variant_env(name, batch, env, **kw):
    _with_env(env, run_variant, name, batch, **kw)


def main(argv):
    names = argv or ["base_s2d_ghost64", "ghost32", "ghost16", "b384",
                     "fusedloss", "cost"]
    emit(platform=jax.devices()[0].platform, n_devices=jax.device_count(),
         xla_flags=__import__("os").environ.get("XLA_FLAGS", ""))
    for n in names:
        try:
            VARIANTS[n]()
        except Exception as e:
            emit(variant=n, error=str(e)[:300])
    emit(done=True)


if __name__ == "__main__":
    main(sys.argv[1:])
