"""Configuration system: YAML files -> recursive attribute namespaces.

Behavioral parity with the reference config layer (``util.py:16-34`` in
AIML-IfI/openset-imagenet): a YAML file is loaded into a nested ``NameSpace``
whose fields are attribute-accessible, round-trips back to a plain dict via
``dict()`` and to YAML text via ``dump()``.  The sweep driver
(``script/train_all.py``) relies on the dump round-trip to materialise
per-run configs, so those semantics are preserved exactly.
"""

from __future__ import annotations

import pathlib
from typing import Any, Mapping

import yaml


class NameSpace:
    """Recursive attribute namespace over a nested mapping.

    Parity: reference ``util.py:16-34``.  Nested dicts become nested
    ``NameSpace`` objects; everything else is stored as-is.
    """

    def __init__(self, config: Mapping[str, Any]):
        wrapped = {
            name: NameSpace(value) if isinstance(value, dict) else value
            for name, value in config.items()
        }
        self.__dict__.update(wrapped)

    def __repr__(self) -> str:
        return "\n".join(f"{k}: {v}" for k, v in vars(self).items())

    # Keep identity hashing (the reference NameSpace defines no __eq__ and
    # is hashable); defining __eq__ alone would set __hash__ = None and
    # break dict/set membership.  NOTE: equal configs therefore hash
    # differently — never rely on dict/set keys to deduplicate NameSpaces
    # by value; compare with == (or .dict()) explicitly instead.
    __hash__ = object.__hash__

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, NameSpace):
            return NotImplemented
        return self.dict() == other.dict()

    def __contains__(self, name: str) -> bool:
        return name in self.__dict__

    def get(self, name: str, default: Any = None) -> Any:
        """Dict-style lookup with a default (convenience extension)."""
        return self.__dict__.get(name, default)

    def dict(self) -> dict:
        """Recursively convert back to a plain dict."""
        return {
            k: v.dict() if isinstance(v, NameSpace) else v
            for k, v in vars(self).items()
        }

    def dump(self, indent: int = 4) -> str:
        """Serialise to YAML text (used by the sweep driver round-trip)."""
        return yaml.dump(_to_dumpable(self.dict()), indent=indent)


def _to_dumpable(obj: Any) -> Any:
    """Make values YAML-safe: pathlib paths become plain strings."""
    if isinstance(obj, dict):
        return {k: _to_dumpable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_dumpable(v) for v in obj]
    if isinstance(obj, pathlib.PurePath):
        return str(obj)
    return obj


def load_yaml(yaml_file) -> NameSpace:
    """Load a YAML file into a nested :class:`NameSpace`.

    Parity: reference ``util.py:31-34``.
    """
    with open(yaml_file, "r") as f:
        config = yaml.safe_load(f)
    return NameSpace(config)
