"""WordNetHierarchy ≡ robustness.ImageNetHierarchy on arbitrary metadata.

The real ``wordnet.is_a.txt`` / ``imagenet_class_index.json`` cannot ship
here, so identical class lists on real data are proven in two parts:

1. (this file) the rewritten hierarchy computes the SAME descendant sets
   as a literal transcription of the reference dependency's algorithm
   (``robustness/tools/imagenet_helpers.py``: single ``parent_wnid`` slot
   overwritten per ``is_a`` line + per-class ascent populating
   ``descendants_all``) on randomized multi-parent DAGs — including the
   last-edge-wins and chain-vs-DAG-closure behaviours real WordNet
   exercises;
2. (test_protocol_real_metadata) the full protocol builder runs against
   the real files whenever ``OSI_IMAGENET_METADATA`` points at them.

Together: same algorithm + same input files => same class lists.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from openset_imagenet_tpu.wordnet import WordNetHierarchy


# -- literal transcription of the reference dependency ----------------------

class _Node:
    """robustness imagenet_helpers.Node: ONE parent slot, descendant set."""

    def __init__(self, wnid):
        self.wnid = wnid
        self.class_num = -1
        self.parent_wnid = None
        self.descendant_count_in = 0
        self.descendants_all = set()


def robustness_tree(edge_lines, in_wnids):
    """ImageNetHierarchy.__init__'s tree construction, verbatim semantics.

    ``add_child`` assigns ``child.parent_wnid = parent`` for every parsed
    line (later edges overwrite earlier ones); afterwards every in-ImageNet
    class walks its parent chain to the root, incrementing
    ``descendant_count_in`` and updating ``descendants_all`` on the way.
    """
    tree = {}

    def get_node(wnid):
        if wnid not in tree:
            tree[wnid] = _Node(wnid)
        return tree[wnid]

    for parent_wnid, child_wnid in edge_lines:
        get_node(parent_wnid)
        child = get_node(child_wnid)
        child.parent_wnid = parent_wnid

    for wnid in in_wnids:
        if wnid not in tree:
            continue
        node = tree[wnid]
        while node.parent_wnid is not None:
            parent = tree[node.parent_wnid]
            parent.descendant_count_in += 1
            parent.descendants_all.add(wnid)
            parent.descendants_all.update(tree[wnid].descendants_all)
            node = parent
    return tree


# -- fixtures ----------------------------------------------------------------

def write_metadata(root: Path, edges, in_wnids):
    root.mkdir(parents=True, exist_ok=True)
    with open(root / "wordnet.is_a.txt", "w") as f:
        for p, c in edges:
            f.write(f"{p} {c}\n")
    with open(root / "words.txt", "w") as f:
        for wnid in {w for e in edges for w in e}:
            f.write(f"{wnid}\tname_{wnid}\n")
    index = {str(i): [w, f"class_{i}"] for i, w in enumerate(in_wnids)}
    with open(root / "imagenet_class_index.json", "w") as f:
        json.dump(index, f)


def random_dag(rng, n_nodes=400, n_leaf_classes=120, multi_parent_frac=0.3):
    """Random acyclic multi-parent hierarchy in shuffled edge order."""
    names = [f"n{i:08d}" for i in range(n_nodes)]
    edges = []
    for i in range(1, n_nodes):
        n_parents = 1
        if rng.random() < multi_parent_frac:
            n_parents = int(rng.integers(2, 4))
        parents = rng.choice(i, size=min(n_parents, i), replace=False)
        for p in parents:
            edges.append((names[int(p)], names[i]))
    rng.shuffle(edges)
    # ImageNet classes: a random subset biased toward high indexes (leaves),
    # plus a few internal nodes (ancestor-of-another-class case).
    leafish = rng.choice(np.arange(n_nodes // 2, n_nodes),
                         size=n_leaf_classes - 5, replace=False)
    internal = rng.choice(np.arange(1, n_nodes // 2), size=5, replace=False)
    in_wnids = [names[int(i)] for i in (*leafish, *internal)]
    rng.shuffle(in_wnids)
    return edges, in_wnids


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_descendants_match_robustness_on_random_dags(seed, tmp_path):
    rng = np.random.default_rng(seed)
    edges, in_wnids = random_dag(rng)
    write_metadata(tmp_path, edges, in_wnids)

    ours = WordNetHierarchy(tmp_path)
    theirs = robustness_tree(edges, in_wnids)

    checked = 0
    for wnid, node in theirs.items():
        expect = sorted(node.descendants_all)
        assert ours.imagenet_descendants(wnid) == expect, wnid
        checked += bool(expect)
    assert checked > 20  # the DAG actually produced nontrivial sets


def test_last_edge_wins_not_dag_closure(tmp_path):
    """A multi-parent class belongs only to its LAST parent's subtree."""
    edges = [
        ("root", "animal"), ("root", "pet"),
        ("animal", "dog_cls"),   # earlier parent
        ("pet", "dog_cls"),      # later parent — wins
        ("animal", "wolf_cls"),
    ]
    write_metadata(tmp_path, edges, ["dog_cls", "wolf_cls"])
    h = WordNetHierarchy(tmp_path)
    assert h.imagenet_descendants("pet") == ["dog_cls"]
    assert h.imagenet_descendants("animal") == ["wolf_cls"]  # NOT dog_cls
    assert h.imagenet_descendants("root") == ["dog_cls", "wolf_cls"]
    # The DAG-closure extension still sees both paths.
    assert "dog_cls" in h.descendants("animal")
    # Cross-check the transcription agrees.
    theirs = robustness_tree(edges, ["dog_cls", "wolf_cls"])
    assert sorted(theirs["animal"].descendants_all) == ["wolf_cls"]


def test_in_imagenet_class_as_ancestor_of_another(tmp_path):
    """An ImageNet class sitting on another class's chain gets it as a
    descendant, regardless of in_wnids processing order."""
    edges = [("root", "a_cls"), ("a_cls", "mid"), ("mid", "b_cls")]
    for order in (["a_cls", "b_cls"], ["b_cls", "a_cls"]):
        write_metadata(tmp_path, edges, order)
        h = WordNetHierarchy(tmp_path)
        theirs = robustness_tree(edges, order)
        for wnid in ("root", "a_cls", "mid"):
            assert (h.imagenet_descendants(wnid)
                    == sorted(theirs[wnid].descendants_all)), (order, wnid)


# -- full protocol-split equivalence on random DAGs --------------------------

def reference_update_classes(protocol, kn_super, neg_super, unk_super,
                             descendants):
    """Literal transcription of reference ``protocol.py:125-168``:
    P1 group concat / P2 sorted-pool half-split / P3 index interleave
    (even -> kn; odd%3==0 -> unk; other odd -> neg), then dedup+sort and
    the sorted-order label map."""
    kn, neg, unk = [], [], []
    if protocol == 1:
        for s in kn_super:
            kn.extend(descendants(s))
        for s in neg_super:
            neg.extend(descendants(s))
        for s in unk_super:
            unk.extend(descendants(s))
    elif protocol == 2:
        all_desc = []
        for s in kn_super:
            all_desc.extend(descendants(s))
        middle = len(all_desc) // 2
        kn.extend(all_desc[:middle])
        neg.extend(all_desc[middle:])
        for s in unk_super:
            unk.extend(descendants(s))
    else:
        for s in kn_super:
            for idx, cls in enumerate(descendants(s)):
                if idx % 2 == 0:
                    kn.append(cls)
                elif idx % 2 != 0 and idx % 3 == 0:
                    unk.append(cls)
                elif idx % 2 != 0 and idx % 3 != 0:
                    neg.append(cls)
        for s in unk_super:
            unk.extend(descendants(s))
    kn = sorted(set(kn))
    neg = sorted(set(neg))
    unk = sorted(set(unk))
    return kn, neg, unk, dict(zip(kn, range(len(kn))))


@pytest.mark.parametrize("protocol", [1, 2, 3])
@pytest.mark.parametrize("seed", [10, 11, 12])
def test_protocol_splits_match_reference_on_random_dags(protocol, seed,
                                                        tmp_path):
    """End-to-end split parity: OUR OpenSetProtocol.update_classes ==
    (robustness-tree descendants) + (reference split rules), with random
    superclass choices on random multi-parent DAGs.  Locks not just the
    descendant SETS but the ORDER-dependent P2 half-split and P3
    interleave, plus label-map assignment and get_label."""
    from openset_imagenet_tpu.protocol import OpenSetProtocol

    rng = np.random.default_rng(seed)
    edges, in_wnids = random_dag(rng)
    write_metadata(tmp_path, edges, in_wnids)
    theirs = robustness_tree(edges, in_wnids)
    in_set = set(in_wnids)

    def ref_descendants(wnid):
        # reference get_descendants_wid: sorted in-ImageNet descendants
        return sorted(w for w in theirs[wnid].descendants_all
                      if w in in_set)

    # Random superclass picks among internal nodes with >= 4 descendants.
    rich = [w for w, n in theirs.items()
            if len(n.descendants_all & in_set) >= 4]
    assert len(rich) >= 6, "DAG too sparse for the fuzz"
    picks = [str(w) for w in
             rng.choice(np.asarray(rich, object), 6, replace=False)]
    kn_super, neg_super, unk_super = picks[:2], picks[2:4], picks[4:6]
    if protocol == 2:
        neg_super = kn_super  # reference P2: negatives share the pool

    p = OpenSetProtocol(tmp_path, tmp_path, protocol)
    p.kn_superclasses = kn_super
    p.neg_superclasses = neg_super
    p.unk_superclasses = unk_super
    p.update_classes()

    kn, neg, unk, label_map = reference_update_classes(
        protocol, kn_super, neg_super, unk_super, ref_descendants)
    assert p.kn_classes == kn
    assert p.neg_classes == neg
    assert p.unk_classes == unk
    assert p.label_map == label_map
    for cls in kn:
        assert p.get_label(cls) == label_map[cls]
    # get_label precedence parity (reference protocol.py:193-204): known
    # wins over negative, negative over unknown, else -2.
    for cls in neg:
        expect = label_map[cls] if cls in label_map else -1
        assert p.get_label(cls) == expect
    for cls in unk:
        if cls in label_map:
            expect = label_map[cls]
        elif cls in set(neg):
            expect = -1
        else:
            expect = -2
        assert p.get_label(cls) == expect


# -- real-metadata integration (runs when the user supplies the files) ------

@pytest.mark.skipif("OSI_IMAGENET_METADATA" not in os.environ,
                    reason="set OSI_IMAGENET_METADATA to the directory with "
                           "the real wordnet.is_a.txt / words.txt / "
                           "imagenet_class_index.json to run")
def test_protocol_real_metadata_class_lists():
    """Against real metadata: structural invariants for all 3 protocols,
    plus exact wnid-list goldens when ``OSI_PROTOCOL_GOLDENS`` names a JSON
    of the reference's lists (``{"1": {"kn": [...], "neg": [...],
    "unk": [...]}, ...}`` — produce it once with the reference repo's
    ``OpenSetProtocol.update_classes()``)."""
    meta = Path(os.environ["OSI_IMAGENET_METADATA"])
    from openset_imagenet_tpu.protocol import OpenSetProtocol

    goldens = None
    if os.environ.get("OSI_PROTOCOL_GOLDENS"):
        with open(os.environ["OSI_PROTOCOL_GOLDENS"]) as f:
            goldens = json.load(f)
    for proto in (1, 2, 3):
        p = OpenSetProtocol(meta.parent, meta, proto)  # imagenet dir unused
        p.update_classes()
        assert p.kn_classes and p.unk_classes
        assert p.kn_classes == sorted(set(p.kn_classes))
        assert not set(p.kn_classes) & set(p.unk_classes)
        assert [p.label_map[c] for c in p.kn_classes] == \
            list(range(len(p.kn_classes)))
        print(f"P{proto}: {len(p.kn_classes)} known / "
              f"{len(p.neg_classes)} negative / {len(p.unk_classes)} unknown")
        if goldens is not None:
            g = goldens[str(proto)]
            assert p.kn_classes == sorted(g["kn"]), proto
            assert p.neg_classes == sorted(g["neg"]), proto
            assert p.unk_classes == sorted(g["unk"]), proto
