"""Protocol-builder tests on a synthetic WordNet hierarchy + ImageNet tree.

Exercises SURVEY.md C1 semantics: descendant queries, the three protocols'
class-selection rules, label assignment (0..N-1 / -1 / -2), the seeded
stratified 80/20 split, CSV output, and the LaTeX class table.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from openset_imagenet_tpu.protocol import OpenSetProtocol
from openset_imagenet_tpu.wordnet import WordNetHierarchy, \
    common_superclass_wnid


def build_fake_metadata(root: Path, leaves_per_super=6):
    """A tiny is-a DAG: each reference superclass gets synthetic leaves.

    The leaves are in-ImageNet wnids; intermediate nodes are not.
    """
    supers = [
        "n02084071", "n02118333", "n02115335", "n02114100", "n02120997",
        "n02131653", "n02441326", "n02370806", "n02469914", "n07555863",
        "n03791235", "n03183080", "n02087122", "n02085374",
        "n01503061", "n02159955", "n03405725", "n02512053", "n02484322",
        "n02958343", "n04490091", "n13134947", "n12992868", "n02858304",
        "n03082979", "n01661091", "n03051540", "n07707451", "n02686568",
    ]
    edges, leaves, names = [], [], {}
    for si, sup in enumerate(supers):
        names[sup] = f"superclass_{si}"
        # an intermediate node to test transitivity
        mid = f"n9{si:03d}0000"
        edges.append((sup, mid))
        names[mid] = f"mid_{si}"
        for li in range(leaves_per_super):
            leaf = f"n8{si:03d}{li:04d}"
            parent = mid if li % 2 == 0 else sup
            edges.append((parent, leaf))
            leaves.append(leaf)
            names[leaf] = f"leaf_{si}_{li}, alt_{si}_{li}"
    root.mkdir(parents=True, exist_ok=True)
    with open(root / "wordnet.is_a.txt", "w") as f:
        for p, c in edges:
            f.write(f"{p} {c}\n")
    with open(root / "words.txt", "w") as f:
        for wnid, name in names.items():
            f.write(f"{wnid}\t{name}\n")
    index = {str(i): [wnid, f"class_{i}"] for i, wnid in enumerate(leaves)}
    with open(root / "imagenet_class_index.json", "w") as f:
        json.dump(index, f)
    return supers, leaves


def build_fake_imagenet(root: Path, leaves, train_n=10, val_n=4):
    for split, n in (("train", train_n), ("val", val_n)):
        for wnid in leaves:
            d = root / split / wnid
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                (d / f"{wnid}_{i}.JPEG").touch()


@pytest.fixture(scope="module")
def fake_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("imagenet")
    meta = root / "meta"
    supers, leaves = build_fake_metadata(meta)
    build_fake_imagenet(root, leaves)
    return root, meta, supers, leaves


def test_hierarchy_descendants(fake_tree):
    root, meta, supers, leaves = fake_tree
    h = WordNetHierarchy(meta)
    desc = h.imagenet_descendants("n02084071")
    assert len(desc) == 6  # all synthetic leaves of the dog superclass
    assert desc == sorted(desc)
    assert all(d in set(h.in_wnids) for d in desc)
    # all-descendants includes the intermediate node too.
    assert len(h.all_descendants_sorted("n02084071")) == 7


def test_mixed13_lookup():
    assert len(common_superclass_wnid("mixed_13")) == 13
    with pytest.raises(KeyError):
        common_superclass_wnid("nope")


def test_protocol1_labels_and_split(fake_tree, tmp_path):
    root, meta, supers, leaves = fake_tree
    p = OpenSetProtocol(root, meta, 1)
    p.create_dataset(random_state=42)
    assert len(p.kn_classes) == 6          # dog leaves
    assert len(p.neg_classes) == 8 * 6     # 8 negative superclasses
    assert len(p.unk_classes) == 3 * 6
    # Labels 0..5 in sorted order.
    assert [p.get_label(c) for c in p.kn_classes] == list(range(6))
    assert p.get_label(p.neg_classes[0]) == -1
    assert p.get_label(p.unk_classes[0]) == -2

    # 80/20 stratified: train 8/class, val 2/class over 54 train classes.
    assert len(p.data["train"]) == 8 * 54
    assert len(p.data["val"]) == 2 * 54
    # Test = ImageNet-val of all 3 groups.
    assert len(p.data["test"]) == 4 * (6 + 48 + 18)
    labels = {lbl for _, lbl in p.data["test"]}
    assert -1 in labels and -2 in labels and 0 in labels

    # Deterministic under the same seed.
    p2 = OpenSetProtocol(root, meta, 1)
    p2.create_dataset(random_state=42)
    assert p2.data["train"] == p.data["train"]

    p.save_datasets_to_csv(tmp_path)
    for split in ("train", "val", "test"):
        assert (tmp_path / f"p1_{split}.csv").exists()
    # CSV is loadable by the dataset layer.
    from openset_imagenet_tpu.dataset import ImagenetDataset
    ds = ImagenetDataset(tmp_path / "p1_train.csv", root)
    assert len(ds) == len(p.data["train"])
    assert ds.label_count == 7  # 6 knowns + the -1 negative label


def test_protocol_generation_is_deterministic_golden(fake_tree, tmp_path):
    """Committed golden hash: class selection + seed-42 split regression.

    Any change to the hierarchy traversal, class selection rules, label
    assignment, or stratified-split mechanics changes this digest.  (The
    real-metadata equivalent runs when OSI_IMAGENET_METADATA is set; this
    locks determinism on the synthetic tree everywhere.)
    """
    import hashlib

    root, meta, supers, leaves = fake_tree
    classes_digest = hashlib.sha256()   # repo-only selection/label logic
    split_digest = hashlib.sha256()     # includes sklearn's shuffling
    for proto in (1, 2, 3):
        p = OpenSetProtocol(root, meta, proto)
        p.create_dataset(random_state=42)
        classes_digest.update(repr((proto, p.kn_classes, p.neg_classes,
                                    p.unk_classes)).encode())
        for split in ("train", "val", "test"):
            for path, label in p.data[split]:
                split_digest.update(
                    f"{proto}/{split}/{path}/{label}".encode())
    assert classes_digest.hexdigest() == (
        "90fb2bb1d09804e43c5817658474878568e16543216e668bfa920d8c8354fe07"), \
        "class selection / label assignment changed"
    assert split_digest.hexdigest() == (
        "ec19d2a024f8439e80c78b29710018c4d680a73bc2dbbba695a34ed704f2ee0c"), \
        ("split membership changed — repo split logic OR scikit-learn's "
         "StratifiedShuffleSplit internals (check the sklearn version "
         "before suspecting repo code)")


def test_protocol2_half_split(fake_tree):
    root, meta, supers, leaves = fake_tree
    p = OpenSetProtocol(root, meta, 2)
    p.update_classes()
    pool = p.get_descendants_wid("n02087122")
    assert p.kn_classes == sorted(pool[:3])
    assert p.neg_classes == sorted(pool[3:])
    assert len(p.unk_classes) == 8 * 6


def test_protocol3_interleave(fake_tree):
    root, meta, supers, leaves = fake_tree
    p = OpenSetProtocol(root, meta, 3)
    p.update_classes()
    # Per superclass with 6 descendants: idx 0,2,4 known; idx 3 unknown;
    # idx 1,5 negative.  13 superclasses, plus 5 unknown-only superclasses.
    # feline (n02120997) appears in both mixed_13 and... it's unique here.
    assert len(p.kn_classes) == 13 * 3
    assert len(p.neg_classes) == 13 * 2
    assert len(p.unk_classes) == 13 * 1 + 5 * 6


def test_write_class_list(fake_tree, tmp_path):
    root, meta, supers, leaves = fake_tree
    for proto in (1, 2, 3):
        p = OpenSetProtocol(root, meta, proto)
        p.update_classes()
        tex = tmp_path / f"classes_p{proto}.tex"
        p.write_class_list(tex)
        content = tex.read_text()
        assert "\\it" in content and "\\\\" in content
        # Every row has exactly 5 column separators (6 columns).
        for line in content.strip().splitlines():
            assert line.count("&") == 5, line


def test_protocols_cli(fake_tree, tmp_path, capsys):
    root, meta, supers, leaves = fake_tree
    from openset_imagenet_tpu.script.protocols import main
    main(["--protocols", "1", "--imagenet-directory", str(root),
          "--metadata-directory", str(meta),
          "--output-directory", str(tmp_path / "proto")])
    assert (tmp_path / "proto" / "p1_train.csv").exists()
    out = capsys.readouterr().out
    assert "Protocol 1" in out
