"""Three-loss unknown-confidence ordering study (VERDICT round-3 #6).

The hardware drive (tools/drive_cli.py, BENCH.md round-3) reproduced the
paper's qualitative result once: the entropic open-set loss rejects
unknowns best (test unknown-confidence EOS 0.698 > S 0.549 > BG 0.317,
the reference's LaTeX report table, ``plot_all.py:344-387``).  A single
run is an anecdote; this study repeats the drive's evaluation over
>= 5 seeds per loss and reports means with 95% t confidence intervals
plus PAIRED per-seed interval tests on the adjacent orderings
(EOS > S and S > BG), so the claim is locked statistically.

The synthetic world keeps the drive's color-prototype images but adopts
the PROTOCOL's class structure (reference ``protocol.py``, SURVEY.md §1):
known, trained-negative, and unseen-unknown CLASSES are all drawn from
one palette family in P1's ~1:0.6:1.4 ratio, so no loss can distinguish
negatives from unknowns by kind — only by generalization.  (Calibration
showed the drive's own single-dark-unknown world measures seed noise:
where one off-manifold point lands in each trained model's decision
geometry is a coin flip — unk_conf spanned 0.02-0.999 across garbage
seeds.  Many unseen classes average that instability away.)  Training
uses the production engine factories (the same ``make_loss_fn`` /
``make_train_step`` / label surgery as the worker, reference
``train.py:270-293,330-336``):

* entropic — knowns + negatives (label -1), ``n_out = K``;
* softmax  — negatives REMOVED from train (reference train.py:291-293),
  ``n_out = K``;
* garbage  — negatives become class K, balanced class weights
  (reference dataset.py:77-86), ``n_out = K + 1``.

The reported metric is the report table's unknown confidence on the
test set: ``1 + offset - max(score over the known region)`` averaged
over unknown rows, with the per-regime parameters of
``plot_all.py:166-167`` (garbage excludes its background column from
the max and uses offset 0; entropic/softmax use offset 1/K).

Usage (chip scale, BENCH.md round-4 table):
    python bench_loss_ordering.py --seeds 5
Tiny scale (CPU, what tests/test_loss_ordering.py runs):
    OSI_JAX_PLATFORM=cpu python bench_loss_ordering.py --preset tiny
"""

import argparse
import functools
import json
import time

import numpy as np

LOSSES = ("entropic", "softmax", "garbage")

# Operating points.  "chip": production-shaped (full ResNet-50, 224 px,
# batch 256) for the BENCH.md table; "tiny": CPU-feasible for the
# slow-marked regression test.
PRESETS = {
    # Class-count ratios follow P1 (116 known / 67 negative / 166 unknown
    # classes, SURVEY.md §1): roughly 1 : 0.6 : 1.4.
    "chip": dict(variant="resnet50", img=224, batch=256,
                 k_known=8, k_neg=5, k_unseen=11,
                 n_train_kn=3072, n_train_neg=1024,
                 n_test_kn=768, n_test_unk=256,
                 n_val_kn=512, n_val_neg=256,
                 epochs=6, lr=1e-3, sigma=18.0, s2d=True, ghost=64),
    "tiny": dict(variant="tiny", img=32, batch=64,
                 k_known=4, k_neg=3, k_unseen=6,
                 n_train_kn=768, n_train_neg=256,
                 n_test_kn=192, n_test_unk=64,
                 n_val_kn=128, n_val_neg=64,
                 epochs=6, lr=5e-3, sigma=18.0, s2d=False, ghost=0),
}

def _palette(rng, n, min_dist=70.0, lo=30.0, hi=225.0):
    """``n`` well-separated base colors on the RGB cube.

    The paper's protocol draws known, negative, and unknown CLASSES from
    the same pool (116 / 67 / 166 ImageNet classes for P1, SURVEY.md §1);
    the toy equivalent is one color family split three ways, so no loss
    can tell negatives from unknowns by *kind* — only by generalization.
    """
    colors = []
    for _ in range(10_000):
        if len(colors) == n:
            break
        c = rng.uniform(lo, hi, 3)
        if all(np.linalg.norm(c - o) >= min_dist for o in colors):
            colors.append(c)
    else:
        raise ValueError(
            f"could not place {n} colors with min_dist {min_dist} in "
            f"[{lo},{hi}]^3 after 10000 samples — infeasible packing")
    return np.asarray(colors, np.float32)


def _images(rng, colors, idx, img, sigma):
    """uint8 images: per-row base color + gaussian noise (drive parity)."""
    arr = colors[idx][:, None, None, :] \
        + rng.normal(0, sigma, (len(idx), img, img, 3))
    return np.clip(np.round(arr), 0, 255).astype(np.uint8)


def make_task(p, data_seed=0):
    """Host-side train/val/test arrays shared by every arm and seed.

    Class structure mirrors the protocol's (reference ``protocol.py`` /
    SURVEY.md §1): ``k_known`` known classes, ``k_neg`` trained-negative
    classes (label ``-1``), ``k_unseen`` unknown classes that appear ONLY
    in the test split (label ``-2``, the report-table convention,
    plot_all.py:165).  All classes are color prototypes from one palette.
    """
    rng = np.random.default_rng(data_seed)
    K, img, sig = p["k_known"], p["img"], p["sigma"]
    pal = _palette(rng, K + p["k_neg"] + p["k_unseen"])
    kn, neg, unk = (pal[:K], pal[K:K + p["k_neg"]], pal[K + p["k_neg"]:])

    def split(n_kn, n_neg, n_unk=0):
        imgs, labels = [], []
        idx = rng.integers(0, K, n_kn)
        imgs.append(_images(rng, kn, idx, img, sig))
        labels.append(idx.astype(np.int32))
        if n_neg:
            idx = rng.integers(0, len(neg), n_neg)
            imgs.append(_images(rng, neg, idx, img, sig))
            labels.append(np.full(n_neg, -1, np.int32))
        if n_unk:
            idx = rng.integers(0, len(unk), n_unk)
            imgs.append(_images(rng, unk, idx, img, sig))
            labels.append(np.full(n_unk, -2, np.int32))
        return np.concatenate(imgs), np.concatenate(labels)

    return {"train": split(p["n_train_kn"], p["n_train_neg"]),
            "val": split(p["n_val_kn"], p["n_val_neg"]),
            "test": split(p["n_test_kn"], 0, p["n_test_unk"])}


def surgery(loss_type, images, labels, k_known, train: bool):
    """Per-loss label surgery, reference ``train.py:270-293``."""
    if loss_type == "garbage":
        return images, np.where(labels == -1, k_known, labels)
    if loss_type == "softmax" and train:
        keep = labels >= 0
        return images[keep], labels[keep]
    return images, labels


def build_arm(p, loss_type, task):
    """Model + compiled steps for one loss regime (shared across seeds)."""
    import jax
    import jax.numpy as jnp

    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.models.resnet import build_resnet

    K = p["k_known"]
    n_out = K + 1 if loss_type == "garbage" else K
    model = build_resnet(p["variant"], fc_layer_dim=n_out,
                         out_features=n_out, logit_bias=False,
                         space_to_depth=p["s2d"], bn_stats_rows=p["ghost"])
    tx = engine.build_optimizer(
        NameSpace({"type": "adam", "lr": p["lr"], "decay": 0, "gamma": 1}),
        steps_per_epoch=1)
    if loss_type == "garbage":
        # Balanced weights from the ACTUAL surgered train labels
        # (reference dataset.py:77-86 via calculate_class_weights).
        # bincount keeps index == class id even if some class is absent
        # from a small/overridden split (np.unique would misalign).
        _, lbl = surgery("garbage", *task["train"], K, train=True)
        counts = np.bincount(lbl, minlength=K + 1)
        if (counts == 0).any():
            raise ValueError(f"empty train class(es) {np.where(counts == 0)[0]}"
                             " — grow the split or shrink k_known")
        class_weights = (len(lbl) / (counts * (K + 1))).astype(np.float32)
    else:
        class_weights = None
    fused = jax.default_backend() == "tpu"
    loss_fn = engine.make_loss_fn(loss_type, unk_weight=1.0,
                                  class_weights=class_weights, fused=fused)
    inner = engine.make_train_step(loss_fn)
    batch = p["batch"]

    # One dispatch per epoch (shuffle schedule on device, fori_loop over
    # batches) — per-step dispatch through the tunneled backend serializes
    # (see bench_ghost_ab.py:106-108).
    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(4,))
    def epoch_fn(state, perm, images, labels, spe):
        mask = jnp.ones((batch,), jnp.float32)

        def body(k, carry):
            state, acc = carry
            idx = jax.lax.dynamic_slice_in_dim(perm, k * batch, batch)
            state, m = inner(state, images[idx], labels[idx], mask)
            return state, jax.tree.map(jnp.add, acc, m)

        init = {"loss_sum": jnp.zeros(()), "count": jnp.zeros(())}
        return jax.lax.fori_loop(0, spe, body, (state, init))

    eval_step = engine.make_eval_step(loss_fn, loss_type, n_out)
    # Surgered splits go to the device ONCE per arm (shared across seeds):
    # per-seed host->device transfers through the tunneled backend would
    # dominate run time (~42 MB/s, CLAUDE.md).
    tr_img, tr_lbl = surgery(loss_type, *task["train"], K, train=True)
    va_img, va_lbl = surgery(loss_type, *task["val"], K, train=False)
    te_img, te_lbl = task["test"]
    data = {"train": (jnp.asarray(tr_img), jnp.asarray(tr_lbl)),
            "val": (jnp.asarray(va_img), jnp.asarray(va_lbl)),
            "test": (jnp.asarray(te_img), te_lbl)}
    return dict(model=model, tx=tx, epoch_fn=epoch_fn, eval_step=eval_step,
                fwd=engine.make_forward_step(), n_out=n_out, data=data)


def run_arm(p, arm, loss_type, seed):
    """Train one seed, return the report-table metrics on the test set."""
    import jax
    import jax.numpy as jnp

    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.ops.metrics import confidence
    from openset_imagenet_tpu.ops.oscr import calculate_oscr, ccr_at_fpr

    K, batch = p["k_known"], p["batch"]
    tr_img_d, tr_lbl_d = arm["data"]["train"]
    va_img, va_lbl = arm["data"]["val"]
    te_img, te_lbl = arm["data"]["test"]

    n = (len(tr_lbl_d) // batch) * batch
    spe = n // batch

    state = engine.create_state(arm["model"], jax.random.PRNGKey(seed),
                                arm["tx"], image_size=p["img"])
    host_rng = np.random.default_rng(1000 + seed)
    t0 = time.time()
    for _ in range(p["epochs"]):
        perm = jnp.asarray(
            host_rng.permutation(len(tr_lbl_d))[:n].astype(np.int32))
        state, m = arm["epoch_fn"](state, perm, tr_img_d, tr_lbl_d, spe)
    train_loss = float(m["loss_sum"]) / max(float(m["count"]), 1.0)
    train_s = time.time() - t0

    # Validation γ (the worker's model-selection score, train.py:433).
    sums = None
    vmask = jnp.ones((batch,), jnp.float32)
    for lo in range(0, len(va_lbl) - batch + 1, batch):
        m = arm["eval_step"](state, va_img[lo:lo + batch],
                             va_lbl[lo:lo + batch], vmask)
        sums = m if sums is None else jax.tree.map(jnp.add, sums, m)
    sums = jax.tree.map(float, sums)
    gamma = (sums["kn_sum"] / max(sums["kn_count"], 1)
             + sums["neg_sum"] / max(sums["neg_count"], 1))

    # Test-set forward -> report-table confidences (plot_all.py:160-175).
    scores = []
    n_te = (len(te_lbl) // batch) * batch
    for lo in range(0, n_te, batch):
        _, _, sc = arm["fwd"](state, te_img[lo:lo + batch])
        scores.append(np.asarray(sc))
    scores = np.concatenate(scores)
    gt = te_lbl[:n_te].astype(int)
    offset = 0.0 if loss_type == "garbage" else 1.0 / K
    last_valid = -1 if loss_type == "garbage" else None
    kn_conf, _, unk_conf, _ = confidence(
        scores, gt, offset=offset, unknown_class=-2,
        last_valid_class=last_valid)
    # OSCR contract (ops/oscr.py:31-33, reference util.py:186-188): the
    # caller drops the garbage model's background column first — else
    # argmax/max pick column K for exactly the unknown rows.
    ccr, fpr = calculate_oscr(gt, scores[:, :K], unk_label=-2)
    trapz = getattr(np, "trapezoid", np.trapz)
    order = np.argsort(fpr)
    auc = float(trapz(np.asarray(ccr)[order], np.sort(fpr))) if len(ccr) \
        else 0.0
    known = gt >= 0
    acc = float(np.mean(
        np.argmax(scores[known, :K], axis=1) == gt[known])) if known.any() \
        else 0.0
    ccr_01 = ccr_at_fpr(ccr, fpr, 0.1)

    rec = {"loss": loss_type, "seed": seed,
           "train_loss": round(train_loss, 4),
           "gamma": round(gamma, 4),
           "kn_conf": round(float(kn_conf), 4),
           "unk_conf": round(float(unk_conf), 4),
           "known_acc": round(acc, 4),
           "oscr_auc": round(auc, 4),
           "ccr_at_fpr0.1": None if ccr_01 is None else round(ccr_01, 4),
           "imgs_per_sec": round(p["epochs"] * n / train_s, 1)}
    print(json.dumps(rec), flush=True)
    return rec


def _t975(df: int) -> float:
    try:
        import scipy.stats
        return float(scipy.stats.t.ppf(0.975, df))
    except Exception:                                # pragma: no cover
        table = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571,
                 6: 2.447, 7: 2.365, 8: 2.306, 9: 2.262}
        return table.get(df, 1.96)


def _mean_ci(xs):
    xs = np.asarray(xs, np.float64)
    n = len(xs)
    mean = float(xs.mean())
    if n < 2:
        return mean, float("inf")
    half = _t975(n - 1) * float(xs.std(ddof=1)) / np.sqrt(n)
    return mean, float(half)


def summarize(results):
    """Per-loss mean±CI and paired ordering tests.

    A pair is ``significant`` when either its paired 95% t interval
    excludes zero from below or the exact one-sided sign test over seeds
    reaches p <= 0.05.  ``ordered`` = the paper's full EOS > S > BG chain
    holds; ``eos_best`` = the headline claim only (EOS beats both
    baselines at rejecting unknowns).
    """
    by_loss = {lt: sorted([r for r in results if r["loss"] == lt],
                          key=lambda r: r["seed"]) for lt in LOSSES}
    summary = {}
    for lt, rs in by_loss.items():
        m, h = _mean_ci([r["unk_conf"] for r in rs])
        am, ah = _mean_ci([r["oscr_auc"] for r in rs])
        summary[lt] = {"n": len(rs),
                       "unk_conf_mean": round(m, 4),
                       "unk_conf_ci95": round(h, 4),
                       "oscr_auc_mean": round(am, 4),
                       "oscr_auc_ci95": round(ah, 4),
                       "kn_conf_mean": round(float(np.mean(
                           [r["kn_conf"] for r in rs])), 4)}

    def paired(a, b):
        import math
        diffs = [x["unk_conf"] - y["unk_conf"]
                 for x, y in zip(by_loss[a], by_loss[b], strict=True)]
        m, h = _mean_ci(diffs)
        wins, n = sum(d > 0 for d in diffs), len(diffs)
        # One-sided exact sign test: P(>= wins | fair coin).  Robust to the
        # per-seed difference scale, which a t interval on 5 seeds is not.
        sign_p = sum(math.comb(n, k) for k in range(wins, n + 1)) / 2 ** n
        return {"mean_diff": round(m, 4), "ci95": round(h, 4),
                "wins": wins, "n": n, "sign_p": round(sign_p, 4),
                "significant": bool(m - h > 0 or sign_p <= 0.05)}

    pairs = {"entropic_gt_softmax": paired("entropic", "softmax"),
             "softmax_gt_garbage": paired("softmax", "garbage"),
             "entropic_gt_garbage": paired("entropic", "garbage")}
    verdict = {
        "ordered": bool(pairs["entropic_gt_softmax"]["significant"]
                        and pairs["softmax_gt_garbage"]["significant"]),
        "eos_best": bool(pairs["entropic_gt_softmax"]["significant"]
                         and pairs["entropic_gt_garbage"]["significant"]),
    }
    return {"summary": summary, "pairs": pairs, **verdict}


def run_study(preset="chip", seeds=5, overrides=None):
    p = dict(PRESETS[preset])
    p.update(overrides or {})
    task = make_task(p)
    results = []
    for lt in LOSSES:
        arm = build_arm(p, lt, task)
        for seed in range(seeds):
            results.append(run_arm(p, arm, lt, seed))
    return results, summarize(results)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="chip")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/tests/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    over = {} if args.epochs is None else {"epochs": args.epochs}
    _, summary = run_study(args.preset, args.seeds, over)
    print(json.dumps({"preset": args.preset, "seeds": args.seeds,
                      **summary}), flush=True)


if __name__ == "__main__":
    main()
