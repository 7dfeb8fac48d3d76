"""On-chip ghost-BN quality A/B: does a smaller statistics batch cost γ/OSCR?

BENCH.md round-2: ghost-32 statistics measure ~2700 imgs/s/chip vs the
2630 ghost-64 headline (+3%), but the headline kept ghost-64 for parity
with the reference's BN batch (reference ``config/train.yaml:18``: batch
64, full-batch BN).  This script quantifies what ghost-32/16 actually cost
in model-selection γ (val conf_kn + conf_unk, reference ``train.py:433``)
and OSCR AUC, so the +3% can be taken or refused on evidence.

Protocol: a device-resident synthetic open-set task (class = smooth random
prototype pattern at low SNR + per-sample noise; negatives = pure noise;
test unknowns = UNSEEN prototype classes) trained with the production
engine step — full ResNet-50, S2D stem, entropic loss, Adam, batch 256 —
for a fixed step budget, over ghost ∈ {64, 32, 16} × seeds.  Data is
identical across arms (fixed data seed); init/shuffle vary per seed.
Device-resident data isolates the comparison from the tunneled host link.

Emits one JSON line per run plus a summary line; paste into BENCH.md.

Usage: python bench_ghost_ab.py [--ghosts 64,32,16] [--seeds 3]
                                [--steps 400]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


K_KNOWN = 16          # trained known classes
K_UNSEEN = 8          # test-time unknown classes (never trained)
IMG = 224
# Prototype amplitude vs noise: calibrated so 400 steps reach a MID-RANGE
# γ (≈1.2-1.7) — a saturated task (γ→2, every score 1.0) is insensitive
# to BN-statistics noise and degenerates the OSCR threshold sweep.
AMP = 2.0
SIGMA = 48.0
N_TRAIN_KN, N_TRAIN_NEG = 3584, 512     # 4096 total = 16 batches of 256
N_EVAL_KN, N_EVAL_NEG, N_EVAL_UNK = 768, 256, 256
BATCH = 256


def _prototypes(key, n):
    """Smooth low-frequency class patterns, upsampled to IMG resolution."""
    low = jax.random.normal(key, (n, 14, 14, 3), jnp.float32)
    return jax.image.resize(low, (n, IMG, IMG, 3), "linear")


def _images(key, protos, labels):
    """uint8 images: 128 + AMP * proto[label] + SIGMA * noise  (noise-only
    for rows with label < 0)."""
    n = labels.shape[0]
    noise = SIGMA * jax.random.normal(key, (n, IMG, IMG, 3), jnp.float32)
    pat = jnp.where((labels >= 0)[:, None, None, None],
                    AMP * protos[jnp.maximum(labels, 0)], 0.0)
    return jnp.clip(jnp.round(128.0 + pat + noise), 0, 255).astype(jnp.uint8)


def make_task(data_seed=0):
    """Device-resident train/val/test arrays (shared across all arms)."""
    root = jax.random.PRNGKey(data_seed)
    kp, kt, kv, ks = jax.random.split(root, 4)
    protos = _prototypes(kp, K_KNOWN + K_UNSEEN)

    def split(key, n_kn, n_neg, n_unk=0):
        # Prototype index per row; rows >= K_KNOWN are unseen classes.
        proto_idx = jnp.concatenate([
            jax.random.randint(key, (n_kn,), 0, K_KNOWN),
            jnp.full((n_neg,), -1, jnp.int32),
            jax.random.randint(jax.random.fold_in(key, 3), (n_unk,),
                               K_KNOWN, K_KNOWN + K_UNSEEN)
            if n_unk else jnp.zeros((0,), jnp.int32),
        ]).astype(jnp.int32)
        images = _images(jax.random.fold_in(key, 7), protos, proto_idx)
        # metric labels: 0..K-1 knowns, -1 negatives, -2 unseen unknowns
        labels = jnp.where(proto_idx >= K_KNOWN, -2, proto_idx)
        return images, labels

    train = split(kt, N_TRAIN_KN, N_TRAIN_NEG)
    val = split(kv, N_EVAL_KN, N_EVAL_NEG)
    test = split(ks, 512, N_EVAL_NEG, N_EVAL_UNK)  # 1024 = 4 x BATCH
    return train, val, test


def build_arm(ghost):
    """Model + jitted steps for one ghost size (shared across seeds)."""
    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.models.resnet import build_resnet

    model = build_resnet("resnet50", fc_layer_dim=K_KNOWN,
                         out_features=K_KNOWN, logit_bias=False,
                         space_to_depth=True, bn_stats_rows=ghost)
    tx = engine.build_optimizer(
        NameSpace({"type": "adam", "lr": 1e-3, "decay": 0, "gamma": 1}),
        steps_per_epoch=16)
    loss_fn = engine.make_loss_fn("entropic", unk_weight=1.0, fused=True)
    inner = engine.make_train_step(loss_fn)
    spe = (N_TRAIN_KN + N_TRAIN_NEG) // BATCH

    # One dispatch per EPOCH with the batch gather + step loop inside jit:
    # per-step host->device transfers through the tunneled backend
    # serialize dispatch (measured 460 vs 2630 imgs/s), so the shuffle
    # schedule lives on device and a fori_loop walks it.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state, perm, images, labels):
        mask = jnp.ones((BATCH,), jnp.float32)

        def body(k, carry):
            state, acc = carry
            idx = jax.lax.dynamic_slice_in_dim(perm, k * BATCH, BATCH)
            state, m = inner(state, images[idx], labels[idx], mask)
            # Accumulate over the whole epoch: the reported train_loss is
            # the epoch average, not the last batch's sample.
            return state, jax.tree.map(jnp.add, acc, m)

        init_m = {"loss_sum": jnp.zeros(()), "count": jnp.zeros(())}
        return jax.lax.fori_loop(0, spe, body, (state, init_m))

    return (model, tx, epoch_fn,
            engine.make_eval_step(loss_fn, "entropic", K_KNOWN),
            engine.make_forward_step())


def run_arm(task, arm, ghost, seed, steps):
    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.ops.oscr import calculate_oscr

    (tr_img, tr_lbl), (va_img, va_lbl), (te_img, te_lbl) = task
    model, tx, step, eval_step, fwd = arm
    state = engine.create_state(model, jax.random.PRNGKey(seed), tx)

    n = len(tr_lbl)
    spe = n // BATCH
    host_rng = np.random.default_rng(1000 + seed)
    n_epochs = -(-steps // spe)
    if n_epochs < 1:
        raise ValueError(f"--steps must be >= 1 (got {steps})")
    # Warm the compile OUTSIDE the timing window (one throwaway epoch on a
    # scratch state), then sync so t0 starts clean.
    scratch = engine.create_state(model, jax.random.PRNGKey(10_000), tx)
    warm_perm = jnp.asarray(host_rng.permutation(n).astype(np.int32))
    scratch, wm = step(scratch, warm_perm, tr_img, tr_lbl)
    float(wm["loss_sum"])
    del scratch
    # Each epoch's permutation ships once (one small transfer, not one per
    # step); one dispatch per epoch.
    t0 = time.time()
    for e in range(n_epochs):
        perm = jnp.asarray(host_rng.permutation(n).astype(np.int32))
        state, m = step(state, perm, tr_img, tr_lbl)
    train_loss = float(m["loss_sum"]) / float(m["count"])  # final epoch avg
    train_s = time.time() - t0
    steps = n_epochs * spe  # actual steps executed

    # Validation γ (streaming confidence sums, same code path as worker).
    sums = None
    vmask = jnp.ones((BATCH,), jnp.float32)
    for lo in range(0, len(va_lbl) - BATCH + 1, BATCH):
        m = eval_step(state, va_img[lo:lo + BATCH],
                      va_lbl[lo:lo + BATCH], vmask)
        sums = m if sums is None else jax.tree.map(jnp.add, sums, m)
    sums = jax.tree.map(float, sums)
    conf_kn = sums["kn_sum"] / max(sums["kn_count"], 1)
    conf_unk = sums["neg_sum"] / max(sums["neg_count"], 1)

    # Test OSCR (knowns vs unseen-class unknowns).
    scores = []
    for lo in range(0, len(te_lbl) - BATCH + 1, BATCH):
        _, _, sc = fwd(state, te_img[lo:lo + BATCH])
        scores.append(np.asarray(sc))
    scores = np.concatenate(scores)
    gt = np.asarray(te_lbl)[:len(scores)]
    ccr, fpr = calculate_oscr(gt, scores, unk_label=-2)
    trapz = getattr(np, "trapezoid", np.trapz)
    auc = float(trapz(ccr[np.argsort(fpr)],
                      np.sort(fpr))) if len(ccr) else 0.0

    rec = {"ghost": ghost, "seed": seed, "steps": steps,
           "amp": AMP, "sigma": SIGMA,  # operating point (regime!)
           "train_loss": round(train_loss, 4),
           "gamma": round(conf_kn + conf_unk, 4),
           "conf_kn": round(conf_kn, 4), "conf_unk": round(conf_unk, 4),
           "oscr_auc": round(auc, 4),
           "imgs_per_sec": round(steps * BATCH / train_s, 1)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    global AMP, SIGMA
    ap = argparse.ArgumentParser()
    ap.add_argument("--ghosts", default="64,32,16")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--amp", type=float, default=AMP,
                    help="prototype amplitude (task difficulty knob: "
                         "2 = hard/early-training regime, 4-6 = moderate)")
    ap.add_argument("--sigma", type=float, default=SIGMA)
    args = ap.parse_args()
    AMP, SIGMA = args.amp, args.sigma

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/tests/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    task = make_task()
    results = []
    for ghost in [int(g) for g in args.ghosts.split(",")]:
        arm = build_arm(ghost)
        for seed in range(args.seeds):
            results.append(run_arm(task, arm, ghost, seed, args.steps))

    summary = {}
    for ghost in sorted({r["ghost"] for r in results}, reverse=True):
        rs = [r for r in results if r["ghost"] == ghost]
        summary[str(ghost)] = {
            "gamma_mean": round(float(np.mean([r["gamma"] for r in rs])), 4),
            "gamma_std": round(float(np.std([r["gamma"] for r in rs])), 4),
            "oscr_mean": round(float(np.mean([r["oscr_auc"] for r in rs])),
                               4),
            "oscr_std": round(float(np.std([r["oscr_auc"] for r in rs])), 4),
        }
    print(json.dumps({"summary": summary, "amp": AMP, "sigma": SIGMA}),
          flush=True)


if __name__ == "__main__":
    main()
