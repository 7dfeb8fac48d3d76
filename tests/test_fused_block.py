"""Fused-backward bottleneck: kernel + block-VJP + module equivalence.

The fused path must be a pure performance restructure: same outputs, same
gradients, same running-statistics updates as the unfused Bottleneck
(which itself golden-matches the reference torchvision block).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from openset_imagenet_tpu.models.norm import SubsetBatchNorm
from openset_imagenet_tpu.models.resnet import Bottleneck
from openset_imagenet_tpu.experimental import fused_block as fb


def _site_inputs(m, ci, co, dtype, seed=0):
    rng = np.random.default_rng(seed)
    g = jnp.asarray(rng.standard_normal((m, co)), dtype)
    z = jnp.asarray(rng.standard_normal((m, co)), dtype)
    mask = jnp.asarray(rng.integers(0, 2, (m, co)), jnp.int8)
    x = jnp.asarray(rng.standard_normal((m, ci)), dtype)
    ds = jnp.asarray(rng.standard_normal((m, ci)), dtype)
    w = jnp.asarray(rng.standard_normal((ci, co)) * 0.3, dtype)
    mul_o = jnp.asarray(rng.standard_normal(co), jnp.float32)
    add_o = jnp.asarray(rng.standard_normal(co), jnp.float32)
    mul_i = jnp.asarray(rng.standard_normal(ci), jnp.float32)
    add_i = jnp.asarray(rng.standard_normal(ci), jnp.float32)
    return g, z, mask, x, ds, w, mul_o, add_o, mul_i, add_i


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("cfg", [
    dict(in_act=True, has_mask=True, has_ds=False, emit_gp=True),   # tail
    dict(in_act=False, has_mask=False, has_ds=True, emit_gp=False),  # head
    dict(in_act=False, has_mask=False, has_ds=False, emit_gp=False),
])
def test_bwd_site_pallas_interpret_matches_ref(dtype, cfg):
    m, ci, co = 512, 16, 24
    g, z, mask, x, ds, w, mul_o, add_o, mul_i, add_i = _site_inputs(
        m, ci, co, dtype)
    mask_a = mask if cfg["has_mask"] else None
    ds_a = ds if cfg["has_ds"] else None
    mul_ia = mul_i if cfg["in_act"] else None
    add_ia = add_i if cfg["in_act"] else None

    ref = fb._bwd_ref(g, z, mask_a, x, ds_a, w, mul_o, add_o, mul_ia,
                      add_ia, in_act=cfg["in_act"], emit_gp=cfg["emit_gp"],
                      out_dtype=dtype)
    pal = fb._bwd_pallas(g, z, mask_a, x, ds_a, w, mul_o, add_o, mul_ia,
                         add_ia, in_act=cfg["in_act"],
                         emit_gp=cfg["emit_gp"], out_dtype=dtype,
                         interpret=True)
    names = ["dx", "gp", "dw", "sums_o", "sums_i"]
    assert len(ref) == len(pal) == len(names)
    for name, r, p in zip(names, ref, pal):
        leaves_r = jax.tree.leaves(r)
        leaves_p = jax.tree.leaves(p)
        assert len(leaves_r) == len(leaves_p), name
        for rr, pp in zip(leaves_r, leaves_p):
            np.testing.assert_allclose(
                np.asarray(pp, np.float32), np.asarray(rr, np.float32),
                rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
                atol=1e-2 if dtype == jnp.bfloat16 else 1e-5,
                err_msg=f"{name} mismatch")


def _block_inputs(downsample, stride, dtype=jnp.float32, seed=1,
                  b=2, hw=8, cin=8, f=2):
    rng = np.random.default_rng(seed)
    co = 4 * f
    if not downsample:
        cin = co  # identity skip requires matching channels
    x0 = jnp.asarray(rng.standard_normal((b, hw, hw, cin)), dtype)
    args = dict(
        x0=x0,
        w1=jnp.asarray(rng.standard_normal((cin, f)) * 0.4, jnp.float32),
        w2=jnp.asarray(rng.standard_normal((3, 3, f, f)) * 0.3, jnp.float32),
        w3=jnp.asarray(rng.standard_normal((f, co)) * 0.4, jnp.float32),
        mul1=jnp.asarray(rng.standard_normal(f), jnp.float32),
        add1=jnp.asarray(rng.standard_normal(f), jnp.float32),
        mul2=jnp.asarray(rng.standard_normal(f), jnp.float32),
        add2=jnp.asarray(rng.standard_normal(f), jnp.float32),
        mul3=jnp.asarray(rng.standard_normal(co), jnp.float32),
        add3=jnp.asarray(rng.standard_normal(co), jnp.float32),
    )
    if downsample:
        args.update(
            wd=jnp.asarray(rng.standard_normal((cin, co)) * 0.4,
                           jnp.float32),
            muld=jnp.asarray(rng.standard_normal(co), jnp.float32),
            addd=jnp.asarray(rng.standard_normal(co), jnp.float32),
        )
    return args, stride


@pytest.mark.parametrize("downsample,stride", [
    (False, 1), (True, 1), (True, 2)])
def test_block_vjp_matches_autodiff(downsample, stride):
    """Hand-derived block backward == plain JAX autodiff (f32, jnp path)."""
    args, stride = _block_inputs(downsample, stride)
    keys = list(args)
    r = jnp.asarray(np.random.default_rng(7).standard_normal(
        fb._block_fwd_math(*[args[k] for k in [
            "x0", "w1", "w2", "w3"]], args.get("wd"),
            *[args[k] for k in ["mul1", "add1", "mul2", "add2",
                                "mul3", "add3"]],
            args.get("muld"), args.get("addd"),
            stride=stride)[0].shape), jnp.float32)

    def loss_fused(*vals):
        kw = dict(zip(keys, vals))
        out = fb.bottleneck_fused(**kw, stride=stride, use_pallas=False)
        return jnp.sum(out * r)

    def loss_plain(*vals):
        kw = dict(zip(keys, vals))
        out = fb._block_fwd_math(
            kw["x0"], kw["w1"], kw["w2"], kw["w3"], kw.get("wd"),
            kw["mul1"], kw["add1"], kw["mul2"], kw["add2"],
            kw["mul3"], kw["add3"], kw.get("muld"), kw.get("addd"),
            stride=stride)[0]
        return jnp.sum(out * r)

    vals = [args[k] for k in keys]
    argnums = tuple(range(len(vals)))
    gf = jax.grad(loss_fused, argnums)(*vals)
    gp = jax.grad(loss_plain, argnums)(*vals)
    for k, a, b in zip(keys, gf, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"grad {k} mismatch")


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_block_vjp_pallas_interpret_matches_ref(dtype):
    """Pallas-kernel backward == jnp reference backward, whole block."""
    args, stride = _block_inputs(False, 1, dtype=dtype, b=4, hw=8, f=4)
    keys = list(args)
    vals = [args[k] for k in keys]
    r = jnp.asarray(np.random.default_rng(8).standard_normal(
        args["x0"].shape[:3] + (16,)), jnp.float32)

    def loss(use_pallas, *vs):
        kw = dict(zip(keys, vs))
        out = fb.bottleneck_fused(**kw, stride=stride,
                                  use_pallas=use_pallas, interpret=True)
        return jnp.sum(out.astype(jnp.float32) * r)

    argnums = tuple(range(len(vals)))
    g_ref = jax.grad(functools.partial(loss, False), argnums)(*vals)
    g_pal = jax.grad(functools.partial(loss, True), argnums)(*vals)
    for k, a, b in zip(keys, g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
            atol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
            err_msg=f"grad {k} mismatch")


def _make_pair(strides, train, f=2):
    """Matching fused/unfused Bottleneck modules (f32 for tight compare)."""
    norm = functools.partial(
        SubsetBatchNorm, use_running_average=not train, momentum=0.9,
        epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
        stats_rows=2)
    unfused = Bottleneck(filters=f, strides=strides, norm=norm,
                         dtype=jnp.float32)
    fused = Bottleneck(filters=f, strides=strides, norm=norm,
                       dtype=jnp.float32, fused=True, train=train,
                       stats_rows=2)
    return fused, unfused


@pytest.mark.parametrize("strides,downsample", [(1, False), (2, True)])
def test_module_fused_matches_unfused_train(strides, downsample):
    f = 2
    cin = 4 * f if not downsample else 5
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (4, 8, 8, cin)), jnp.float32)
    fused, unfused = _make_pair(strides, train=True, f=f)

    vf = fused.init(jax.random.PRNGKey(0), x)
    vu = unfused.init(jax.random.PRNGKey(0), x)
    # identical tree structure & shapes -> checkpoints interchangeable
    assert (jax.tree.structure(jax.tree.map(jnp.shape, vf)) ==
            jax.tree.structure(jax.tree.map(jnp.shape, vu)))
    assert (jax.tree.leaves(jax.tree.map(jnp.shape, vf)) ==
            jax.tree.leaves(jax.tree.map(jnp.shape, vu)))

    params = vu["params"]
    stats = vu["batch_stats"]

    def run(mod, p):
        out, upd = mod.apply({"params": p, "batch_stats": stats}, x,
                             mutable=["batch_stats"])
        return out, upd["batch_stats"]

    out_f, st_f = run(fused, params)
    out_u, st_u = run(unfused, params)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    r = jnp.asarray(np.random.default_rng(5).standard_normal(out_u.shape),
                    jnp.float32)

    def loss(mod):
        def fn(p):
            out, _ = mod.apply({"params": p, "batch_stats": stats}, x,
                               mutable=["batch_stats"])
            return jnp.sum(out * r)
        return fn

    gf = jax.grad(loss(fused))(params)
    gu = jax.grad(loss(unfused))(params)
    flat_f = dict(jax.tree_util.tree_flatten_with_path(gf)[0])
    flat_u = dict(jax.tree_util.tree_flatten_with_path(gu)[0])
    assert flat_f.keys() == flat_u.keys()
    for k in flat_u:
        np.testing.assert_allclose(
            np.asarray(flat_f[k]), np.asarray(flat_u[k]),
            rtol=5e-4, atol=5e-4, err_msg=f"param grad {jax.tree_util.keystr(k)}")


def test_module_fused_matches_unfused_eval():
    f = 2
    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (4, 8, 8, 4 * f)), jnp.float32)
    fused, unfused = _make_pair(1, train=False, f=f)
    v = unfused.init(jax.random.PRNGKey(0), x)
    # distinctive running stats
    rng = np.random.default_rng(9)
    stats = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape) ** 2 + 0.1,
                              a.dtype), v["batch_stats"])
    out_u = unfused.apply({"params": v["params"], "batch_stats": stats}, x)
    out_f = fused.apply({"params": v["params"], "batch_stats": stats}, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=1e-4, atol=1e-4)


def test_engine_step_fused_matches_unfused_on_mesh():
    """Fused blocks through the full jitted DP train step (8-dev mesh).

    Locks GSPMD compatibility of the block custom-VJP and end-to-end
    update equivalence with the unfused model (f32, jnp backward on CPU).
    """
    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.models.resnet import build_resnet
    from openset_imagenet_tpu.parallel.mesh import (batch_sharding,
                                                    make_mesh, replicated)

    tx_cfg = NameSpace({"type": "sgd", "lr": 0.1, "decay": 0, "gamma": 1})
    loss_fn = engine.make_loss_fn("entropic")
    rng = np.random.default_rng(3)
    images = rng.integers(0, 256, (16, 32, 32, 3), np.uint8)
    labels = np.asarray(rng.integers(-1, 4, 16), np.int32)
    mask = np.ones(16, np.float32)
    mesh = make_mesh(8)

    def run(fused):
        model = build_resnet("tiny50", fc_layer_dim=4, out_features=4,
                             dtype=jnp.float32, bn_stats_rows=4,
                             fused_blocks=fused)
        tx = engine.build_optimizer(tx_cfg, 1)
        state = engine.create_state(model, jax.random.PRNGKey(0), tx,
                                    image_size=32)
        state = jax.device_put(state, replicated(mesh))
        sh = batch_sharding(mesh)
        b = [jax.device_put(v, sh) for v in (images, labels, mask)]
        step = engine.make_train_step(loss_fn, mesh)
        new_state, m = step(state, *b)
        return new_state, float(m["loss_sum"])

    s_f, loss_f = run(True)
    s_u, loss_u = run(False)
    assert loss_f == pytest.approx(loss_u, rel=1e-4)
    assert (jax.tree.structure(s_f.params) ==
            jax.tree.structure(s_u.params))
    assert (jax.tree.structure(s_f.batch_stats) ==
            jax.tree.structure(s_u.batch_stats))
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, s_f.params)),
                    jax.tree.leaves(jax.tree.map(np.asarray, s_u.params))):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)
    for a, b in zip(
            jax.tree.leaves(jax.tree.map(np.asarray, s_f.batch_stats)),
            jax.tree.leaves(jax.tree.map(np.asarray, s_u.batch_stats))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_masked_add_relu_grads_match_autodiff():
    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal((4, 8, 8, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4, 8, 8, 8)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((4, 8, 8, 8)), jnp.float32)

    def f_masked(a, b):
        return jnp.sum(fb.masked_add_relu(a, b) * r)

    def f_plain(a, b):
        return jnp.sum(jnp.maximum(a + b, 0) * r)

    np.testing.assert_array_equal(np.asarray(f_masked(a, b)),
                                  np.asarray(f_plain(a, b)))
    gm = jax.grad(f_masked, (0, 1))(a, b)
    gp = jax.grad(f_plain, (0, 1))(a, b)
    for x, y in zip(gm, gp):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_boundary_mask_model_grads_match():
    """ResNet with boundary_mask on == off (f32, tight tolerance).

    The op itself is bit-exact (test_masked_add_relu_grads_match_autodiff
    asserts equality); across whole compiled models a small tolerance
    absorbs compilation-dependent FMA/fusion contraction differences.
    """
    from openset_imagenet_tpu.models.resnet import build_resnet
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (4, 32, 32, 3)), jnp.float32)

    def run(bm):
        model = build_resnet("tiny50", fc_layer_dim=4, out_features=4,
                             dtype=jnp.float32, bn_stats_rows=2,
                             boundary_mask=bm)
        v = model.init(jax.random.PRNGKey(0), x, train=False)

        def loss(p):
            (logits, feats), _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return jnp.sum(logits ** 2) + jnp.sum(feats ** 2)

        return v, jax.grad(loss)(v["params"])

    v0, g0 = run(False)
    v1, g1 = run(True)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_worker_end_to_end_fused_and_masked(tmp_path):
    """Full engine worker with model.fused_blocks + boundary_mask on.

    The config-driven regression form of the round-2b verify drive: train
    2 epochs through the fused-backward Bottleneck network, checkpoints
    and scalars land, the score is finite.
    """
    from openset_imagenet_tpu import train as engine
    from tests.test_engine import tiny_cfg, write_protocol_csvs

    write_protocol_csvs(tmp_path)
    cfg = tiny_cfg(tmp_path, "entropic")
    cfg.model = type(cfg.model)({"variant": "tiny50", "bn_stats_rows": 2,
                                 "fused_blocks": True,
                                 "boundary_mask": True})
    info = engine.worker(cfg)
    out = cfg.output_directory
    assert (out / "entropic_curr.pth").exists()
    assert np.isfinite(info["best_score"])


def test_fused_train_requires_ghost_rows():
    blk = Bottleneck(filters=2, strides=1, dtype=jnp.float32, fused=True,
                     train=True, stats_rows=0)
    x = jnp.zeros((2, 8, 8, 8), jnp.float32)
    with pytest.raises(ValueError, match="bn_stats_rows"):
        blk.init(jax.random.PRNGKey(0), x)
