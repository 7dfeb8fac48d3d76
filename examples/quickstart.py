"""Runnable end-to-end walkthrough on a synthetic mini-ImageNet.

Builds a tiny JPEG tree + WordNet metadata, then drives the complete
workflow — protocol generation, training (one loss), score extraction,
report plotting, open-set serving, and deployment export — through the
same code paths the real CLIs use.  Finishes in a few minutes on CPU:

    OSI_JAX_PLATFORM=cpu python examples/quickstart.py /tmp/osi_demo

On a TPU host, drop the env var and raise epochs/batch for real speed.
"""

import json
import sys
import tempfile
from pathlib import Path

import numpy as np
from PIL import Image


def build_synthetic_imagenet(root: Path, n_super=6, leaves_per_super=3,
                             train_per_class=8, val_per_class=3):
    """Tiny ILSVRC-like tree + the three metadata files protocols need."""
    rng = np.random.default_rng(0)
    supers = ["n02084071", "n02118333", "n02115335", "n02114100",
              "n02120997", "n02131653", "n02441326", "n02370806",
              "n02469914", "n07555863", "n03791235", "n03183080"]
    edges, leaves, names = [], [], {}
    for si, sup in enumerate(supers):
        names[sup] = f"superclass_{si}"
        for li in range(leaves_per_super):
            leaf = f"n9{si:03d}{li:04d}"
            edges.append((sup, leaf))
            leaves.append(leaf)
            names[leaf] = f"class_{si}_{li}"
    meta = root / "meta"
    meta.mkdir(parents=True, exist_ok=True)
    (meta / "wordnet.is_a.txt").write_text(
        "".join(f"{p} {c}\n" for p, c in edges))
    (meta / "words.txt").write_text(
        "".join(f"{w}\t{n}\n" for w, n in names.items()))
    (meta / "imagenet_class_index.json").write_text(json.dumps(
        {str(i): [w, names[w]] for i, w in enumerate(leaves)}))

    # Class identity encoded in mean color so the model can actually learn.
    for split, n in (("train", train_per_class), ("val", val_per_class)):
        for idx, wnid in enumerate(leaves):
            d = root / split / wnid
            d.mkdir(parents=True, exist_ok=True)
            color = np.array([37 * idx % 256, 91 * idx % 256,
                              53 * idx % 256], np.int16)
            for i in range(n):
                noise = rng.integers(-40, 40, (96, 96, 3))
                img = np.clip(color[None, None] + noise, 0,
                              255).astype(np.uint8)
                Image.fromarray(img).save(d / f"{wnid}_{i}.JPEG", "JPEG")
    return meta


def main(workdir=None):
    workdir = Path(workdir or tempfile.mkdtemp(prefix="osi_demo_"))
    print(f"== workspace: {workdir}")
    meta = build_synthetic_imagenet(workdir)

    # 1. Protocols (WordNet-derived class splits -> CSVs)
    from openset_imagenet_tpu import OpenSetProtocol
    protocol = OpenSetProtocol(workdir, meta, protocol_num=1)
    protocol.create_dataset(random_state=42)
    protocol.print_data()
    protocol.save_datasets_to_csv(workdir / "protocols")

    # 2. Train (entropic open-set loss, tiny model)
    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.train import worker
    cfg = NameSpace({
        "name": "entropic", "checkpoint": None,
        "log_name": "entropic.log", "train_mode": "train", "gpu": None,
        "parallel": True,
        "data": {"imagenet_path": str(workdir),
                 "train_file": str(workdir / "protocols" / "p{}_train.csv"),
                 "val_file": str(workdir / "protocols" / "p{}_val.csv"),
                 "reader": "auto", "image_size": 64},
        "seed": 42, "batch_size": 16, "epochs": 10, "workers": 4,
        "patience": 0,
        "loss": {"type": "entropic", "w": 1.0},
        "opt": {"type": "adam", "lr": 2e-3, "decay": 0, "gamma": 1},
        "model": {"variant": "tiny"},
        "protocol": 1,
        "output_directory": workdir / "experiments" / "Protocol_1",
    })
    info = worker(cfg)
    print(f"== trained: best γ score {info['best_score']:.3f}")

    # 3. Extract scores for val + test
    from openset_imagenet_tpu.script.evaluate import main as evaluate
    evaluate(["entropic", "1",
              "--imagenet-directory", str(workdir),
              "--protocol-directory", str(workdir / "protocols"),
              "--output-directory", str(cfg.output_directory),
              "--batch-size", "16", "--image-size", "64",
              "--model-variant", "tiny", "--use-best"])

    # 4. Report (OSCR curves + confidence + histograms + LaTeX table)
    import os
    os.chdir(workdir)
    from openset_imagenet_tpu.script.plot_all import main as plot
    plot(["--protocols", "1", "--loss-functions", "entropic",
          "--labels", "EOS", "--use-best",
          "--output-directory", str(workdir / "experiments"),
          "--imagenet-directory", str(workdir),
          "--protocol-directory", str(workdir / "protocols")])
    print(f"== report: {workdir / 'Results_best.pdf'}")

    # 5. Serve with open-set rejection
    from openset_imagenet_tpu.inference import OpenSetPredictor
    n_known = len(protocol.kn_classes)
    predictor = OpenSetPredictor(
        cfg.output_directory / "entropic_best.pth",
        n_classes=n_known, variant="tiny", image_size=64, threshold=0.5)
    some_val = sorted((workdir / "val").rglob("*.JPEG"))[:4]
    classes, scores = predictor.predict([str(p) for p in some_val])
    print("== served:", list(zip(classes.tolist(),
                                 np.round(scores, 3).tolist())))

    # 6. Deploy: self-contained StableHLO artifact (weights baked in,
    # symbolic batch) — serves without the checkpoint or model code.
    from openset_imagenet_tpu.export import (export_serving, load_serving,
                                             save_exported)
    artifact = save_exported(
        export_serving(cfg.output_directory / "entropic_best.pth",
                       n_known, variant="tiny", image_size=64),
        workdir / "entropic.stablehlo")
    # Same geometry the predictor's reader applies (Resize(256) ->
    # CenterCrop(crop) for crops <= 256), via the public transform API.
    from openset_imagenet_tpu.transforms import decode_image, eval_transform
    pixels = np.stack([eval_transform(decode_image(str(p)), crop=64)
                       for p in some_val])
    art_classes = np.argmax(np.asarray(
        load_serving(artifact)(pixels)[2]), -1)
    print(f"== exported {artifact.name} "
          f"({artifact.stat().st_size / 2**20:.1f} MiB); "
          f"artifact predictions: {art_classes.tolist()}")
    print("done.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
