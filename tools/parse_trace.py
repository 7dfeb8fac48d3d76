"""Summarise a jax.profiler trace: device time by op/fusion group.

Reads the ``*.trace.json.gz`` perfetto export inside a profile directory,
keeps events on device (TPU/accelerator) lanes, and aggregates durations by
a normalized op-name key so repeated fusions group together.

Usage: python tools/parse_trace.py /tmp/osi_trace [top_n]
"""

import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def find_trace(root: str) -> Path:
    files = sorted(Path(root).rglob("*.trace.json.gz"))
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return files[-1]


def normalize(name: str) -> str:
    """Strip fusion indexes so repeated instances aggregate."""
    name = re.sub(r"\.\d+", "", name)
    name = re.sub(r"__\d+", "", name)
    return name


def classify(name: str) -> str:
    n = name.lower()
    if "convolution" in n or "conv" in n:
        return "conv"
    if "dot" in n or "matmul" in n:
        return "matmul"
    if "reduce" in n:
        return "reduce"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "fusion" in n:
        return "fusion(other)"
    if "select" in n or "scatter" in n:
        return "select/scatter"
    return "other"


def main(root: str, top_n: int = 30):
    path = find_trace(root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # Identify device lanes: process names containing TPU/device hints.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in pid_names.items()
                   if any(k in n.lower() for k in ("tpu", "device", "xla"))
                   and "host" not in n.lower()}
    if not device_pids:
        print("process lanes:", pid_names)
        raise SystemExit("no device lanes found")

    by_op = defaultdict(float)
    by_class = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = normalize(e.get("name", "?"))
        by_op[name] += dur
        by_class[classify(name)] += dur
        total += dur

    print(f"trace: {path}")
    print(f"total device time: {total / 1e3:.2f} ms "
          f"(across traced steps)\n")
    print("== by class ==")
    for k, v in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"{v / 1e3:9.2f} ms  {100 * v / total:5.1f}%  {k}")
    print(f"\n== top {top_n} ops ==")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:int(top_n)]:
        print(f"{v / 1e3:9.2f} ms  {100 * v / total:5.1f}%  {k[:110]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/osi_trace",
         *(sys.argv[2:]))
