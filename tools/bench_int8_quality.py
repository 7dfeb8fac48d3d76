"""int8 PTQ open-set quality at production shape (VERDICT round-4 #3/#7).

The round-4 serving recommendation ("--optimize int8": +19% at batch 256,
+39% at 64, BENCH.md) shipped with only toy-scale accuracy evidence
(75/75 class agreement on the drive model).  This tool bounds the
OPEN-SET quality cost at production shape without real ImageNet: it
trains a production-width ResNet-50 (224 px, ghost-64, S2D) on the
synthetic color-protocol task of ``bench_loss_ordering`` (entropic arm —
the paper's flagship regime) on-chip, then evaluates the SAME trained
weights through every serving graph:

* ``bf16``           — the unoptimized baseline forward,
* ``fold_bn``        — batch-norm folding only,
* ``int8 @ N``       — abs-max activation calibration on N images
                       (N in {64, 256, 1024}: calibration-set-size
                       sensitivity),
* ``int8 p99.9 @ N`` — percentile calibration (outlier-clipped scales).

Reported per variant: validation γ (the worker's model-selection score,
kn_conf + neg_conf), known-class accuracy, OSCR AUC, CCR at FPR
{1e-3, 1e-2, 1e-1} (the reference's LaTeX-table grid,
reference ``script/plot_all.py:344-387``), plus agreement with the bf16
argmax and the max softmax drift.  Deltas vs bf16 answer: does serving
int8 move the open-set operating point?

Usage (chip, BENCH.md round-5 table):
    python tools/bench_int8_quality.py
CPU smoke (tiny):
    OSI_JAX_PLATFORM=cpu python tools/bench_int8_quality.py --preset tiny
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import bench_loss_ordering as blo  # noqa: E402  (repo-root harness)

# More FPR resolution than the ordering study needs: 2048 test unknowns
# put the lowest resolvable FPR at ~5e-4, so the CCR@1e-3 cell of the
# reference grid is measurable; 1024 val rows cover the largest
# calibration size.
CHIP_OVERRIDES = dict(n_test_kn=2048, n_test_unk=2048,
                      n_val_kn=768, n_val_neg=256)
TINY_OVERRIDES = dict(n_test_kn=256, n_test_unk=256,
                      n_val_kn=224, n_val_neg=32)


def forward_scores(fwd, state, img_d, n_rows, batch):
    """Chunked forward -> host float32 scores for the first n_rows."""
    n = (n_rows // batch) * batch
    out = []
    for lo in range(0, n, batch):
        _, _, sc = fwd(state, img_d[lo:lo + batch])
        out.append(np.asarray(sc, np.float32))
    return np.concatenate(out)


def quality(scores, gt, K):
    """Open-set metrics for one serving graph's test scores."""
    from openset_imagenet_tpu.ops.metrics import confidence
    from openset_imagenet_tpu.ops.oscr import calculate_oscr, ccr_at_fpr

    kn_conf, _, unk_conf, _ = confidence(scores, gt, offset=1.0 / K,
                                         unknown_class=-2)
    ccr, fpr = calculate_oscr(gt, scores[:, :K], unk_label=-2)
    trapz = getattr(np, "trapezoid", np.trapz)
    order = np.argsort(fpr)
    auc = float(trapz(np.asarray(ccr)[order], np.sort(fpr))) if len(ccr) \
        else 0.0
    known = gt >= 0
    acc = float(np.mean(np.argmax(scores[known, :K], axis=1) == gt[known]))
    out = {"known_acc": round(acc, 4),
           "kn_conf": round(float(kn_conf), 4),
           "unk_conf": round(float(unk_conf), 4),
           "oscr_auc": round(auc, 4),
           # Few thresholds = a saturated (too-easy) task; the CCR grid
           # is only meaningful when this is large.
           "n_thresholds": int(len(ccr))}
    for q in (1e-3, 1e-2, 1e-1):
        v = ccr_at_fpr(ccr, fpr, q)
        out[f"ccr@{q:g}"] = None if v is None else round(v, 4)
    return out


def gamma_on_val(fwd, state, va_img_d, va_lbl, batch, K):
    """The worker's model-selection γ (train.py: conf_kn + conf_unk on a
    val split whose negatives carry label -1)."""
    from openset_imagenet_tpu.ops.metrics import confidence

    scores = forward_scores(fwd, state, va_img_d, len(va_lbl), batch)
    kn_conf, _, neg_conf, _ = confidence(
        scores, va_lbl[:len(scores)].astype(int), offset=1.0 / K,
        unknown_class=-1)
    return float(kn_conf) + float(neg_conf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=("chip", "tiny"), default="chip")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(ROOT / "tests" / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.optimize import optimized_inference

    p = dict(blo.PRESETS[args.preset])
    p.update(CHIP_OVERRIDES if args.preset == "chip" else TINY_OVERRIDES)
    if args.epochs is not None:
        p["epochs"] = args.epochs
    K, batch = p["k_known"], p["batch"]

    task = blo.make_task(p)
    arm = blo.build_arm(p, "entropic", task)
    model = arm["model"]

    # Train one production-shape model (the ordering study's epoch_fn —
    # one dispatch per epoch; entropic = the paper's flagship regime).
    t0 = time.time()
    tr_img_d, tr_lbl_d = arm["data"]["train"]
    n = (len(arm["data"]["train"][1]) // batch) * batch
    spe = n // batch
    state = engine.create_state(model, jax.random.PRNGKey(args.seed),
                                arm["tx"], image_size=p["img"])
    host_rng = np.random.default_rng(1000 + args.seed)
    m = None
    for _ in range(p["epochs"]):
        perm = jnp.asarray(
            host_rng.permutation(len(tr_lbl_d))[:n].astype(np.int32))
        state, m = arm["epoch_fn"](state, perm, tr_img_d, tr_lbl_d, spe)
    train_loss = float(m["loss_sum"]) / max(float(m["count"]), 1.0)
    print(json.dumps({"train_loss": round(train_loss, 4),
                      "train_s": round(time.time() - t0, 1)}), flush=True)

    te_img_d, te_lbl = arm["data"]["test"]
    va_img_d, va_lbl = arm["data"]["val"]
    va_lbl = np.asarray(va_lbl)
    # Calibration pools come from the HOST val arrays (what a serving
    # operator has: held-out images, no labels needed).
    val_host = task["val"][0]
    cal_sizes = [s for s in (64, 256, 1024) if s <= len(val_host)]

    variants = [("bf16", None, None, None),
                ("fold_bn", "fold_bn", None, None)]
    for s in cal_sizes:
        variants.append((f"int8@{s}", "int8", s, None))
    for s in cal_sizes[1:]:
        variants.append((f"int8_p99.9@{s}", "int8", s, 99.9))

    results = {}
    baseline_scores = None
    for name, mode, cal_n, pct in variants:
        t0 = time.time()
        if mode is None:
            fwd, st = arm["fwd"], state
        else:
            cal = val_host[:cal_n] if cal_n else None
            _, st = optimized_inference(model, state, mode,
                                        calibration=cal,
                                        image_size=p["img"],
                                        percentile=pct)
            fwd = engine.make_forward_step()
        scores = forward_scores(fwd, st, te_img_d, len(te_lbl), batch)
        gt = np.asarray(te_lbl)[:len(scores)].astype(int)
        m = quality(scores, gt, K)
        m["gamma"] = round(gamma_on_val(fwd, st, va_img_d, va_lbl,
                                        batch, K), 4)
        if baseline_scores is None:
            baseline_scores = scores
            m["agree_known"] = 1.0
            m["max_softmax_drift"] = 0.0
        else:
            known = gt >= 0
            m["agree_known"] = round(float(np.mean(
                np.argmax(scores[known, :K], 1)
                == np.argmax(baseline_scores[known, :K], 1))), 4)
            m["max_softmax_drift"] = round(float(
                np.abs(scores - baseline_scores).max()), 4)
        m["eval_s"] = round(time.time() - t0, 1)
        results[name] = m
        print(json.dumps({"variant": name, **m}), flush=True)

    base = results["bf16"]
    deltas = {name: {k: (None if m[k] is None or base[k] is None
                         else round(m[k] - base[k], 4))
                     for k in ("gamma", "known_acc", "oscr_auc",
                               "ccr@0.001", "ccr@0.01", "ccr@0.1")}
              for name, m in results.items() if name != "bf16"}
    print(json.dumps({"preset": args.preset, "seed": args.seed,
                      "epochs": p["epochs"],
                      "n_test": int((len(np.asarray(te_lbl)) // batch)
                                    * batch),
                      "deltas_vs_bf16": deltas}), flush=True)


if __name__ == "__main__":
    main()
