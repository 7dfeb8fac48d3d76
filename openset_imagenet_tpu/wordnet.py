"""Standalone WordNet/ImageNet hierarchy (replaces the ``robustness`` dep).

The reference builds its protocols on ``robustness.tools.imagenet_helpers.
ImageNetHierarchy`` (reference ``protocol.py:4,23``), which parses three
metadata files that ship with ImageNet tooling:

* ``wordnet.is_a.txt`` — one ``"<parent_wnid> <child_wnid>"`` edge per line;
* ``words.txt``        — ``"<wnid>\\t<comma-separated names>"`` per line;
* ``imagenet_class_index.json`` — the 1000 ILSVRC2012 classes as
  ``{"idx": [wnid, name], ...}``.

This module reimplements exactly the queries the protocol layer needs —
transitive descendant sets, the in-ImageNet wnid set, and wnid -> name
lookup — from those same files, with no external dependency.  Descendant
enumeration is memoised DFS over the is-a DAG; all query results are sorted,
making protocol generation deterministic.

``common_superclass_wnid('mixed_13')`` is reproduced as the MIXED_13
constant (the 13 superclass wnids the reference cites inline at
``protocol.py:62-76``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, FrozenSet, List, Set


# The 'mixed_13' superclass group (robustness's common_superclass_wnid):
# dog, bird, insect, furniture, fish, monkey, car, feline, truck, fruit,
# fungus, boat, computer.
MIXED_13 = (
    "n02084071", "n01503061", "n02159955", "n03405725", "n02512053",
    "n02484322", "n02958343", "n02120997", "n04490091", "n13134947",
    "n12992868", "n02858304", "n03082979",
)


class WordNetHierarchy:
    """is-a DAG over wnids with memoised transitive-descendant queries."""

    def __init__(self, metadata_path):
        meta = Path(metadata_path)
        self._children: Dict[str, List[str]] = {}
        with open(meta / "wordnet.is_a.txt") as f:
            for line in f:
                parts = line.split()
                if len(parts) != 2:
                    continue
                parent, child = parts
                self._children.setdefault(parent, []).append(child)

        self._names: Dict[str, str] = {}
        with open(meta / "words.txt") as f:
            for line in f:
                wnid, _, name = line.rstrip("\n").partition("\t")
                self._names[wnid] = name

        with open(meta / "imagenet_class_index.json") as f:
            index = json.load(f)
        # wnid per ILSVRC2012 class, in class-index order.
        self.in_wnids: List[str] = [v[0] for _, v in sorted(
            index.items(), key=lambda kv: int(kv[0]))]
        self._in_wnid_set: FrozenSet[str] = frozenset(self.in_wnids)
        self._desc_cache: Dict[str, FrozenSet[str]] = {}

    def name_of(self, wnid: str) -> str:
        """Human-readable name(s) of a wnid (words.txt line)."""
        return self._names.get(wnid, wnid)

    def children(self, wnid: str) -> List[str]:
        return self._children.get(wnid, [])

    def descendants(self, wnid: str) -> FrozenSet[str]:
        """All transitive descendants of ``wnid`` (excluding itself)."""
        cached = self._desc_cache.get(wnid)
        if cached is not None:
            return cached
        out: Set[str] = set()
        stack = list(self._children.get(wnid, ()))
        while stack:
            node = stack.pop()
            if node in out:
                continue
            out.add(node)
            stack.extend(self._children.get(node, ()))
        result = frozenset(out)
        self._desc_cache[wnid] = result
        return result

    def imagenet_descendants(self, wnid: str) -> List[str]:
        """Sorted descendants restricted to the 1000 ILSVRC2012 wnids.

        Parity: the reference's ``get_descendants_wid(..., in_imagenet=True)``
        (reference ``protocol.py:100-112``).
        """
        return sorted(self.descendants(wnid) & self._in_wnid_set)

    def all_descendants_sorted(self, wnid: str) -> List[str]:
        """Sorted full descendant list (``in_imagenet=False`` variant)."""
        return sorted(self.descendants(wnid))


def common_superclass_wnid(group: str):
    """Superclass-group lookup; only 'mixed_13' is used by the protocols."""
    if group == "mixed_13":
        return list(MIXED_13)
    raise KeyError(f"unknown superclass group {group!r}")
