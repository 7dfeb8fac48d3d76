"""Summarise a jax.profiler trace: device time by op, optionally joined
with the step's optimized HLO for exact per-category attribution.

Usage:
  python tools/parse_trace.py <trace_dir> [top_n]
  python tools/parse_trace.py <trace_dir> [top_n] --hlo <hlo_dump.txt>
  python tools/parse_trace.py <trace_dir> [top_n] --hlo <...> --buckets
      (adds direction x kind and stage x direction x kind attribution,
       the tables behind BENCH.md's round-2 analysis)

The trace is the ``*.trace.json.gz`` perfetto export inside a profile
directory (``jax.profiler.trace``); the HLO dump comes from
``bench_variants.py hlo`` (``compiled.as_text()``).  With ``--hlo``, each
timed fusion instance is classified by the CONTENT of its fused
computation (convolution / dot / reduce / elementwise ...), which is how
the v5e step was attributed in BENCH.md.
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


def load_device_ops(path: Path):
    """{instance_name: total_us} from the XLA Ops device lane + step count."""
    with gzip.open(path, "rt") as f:
        events = json.load(f)["traceEvents"]
    lanes = {}
    device_pid = None
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in e["args"].get("name", "") or \
                    "GPU" in e["args"].get("name", ""):
                device_pid = e["pid"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e["pid"], e["tid"])] = e["args"].get("name", "")
    ops_tid = next((tid for (pid, tid), n in lanes.items()
                    if pid == device_pid and n == "XLA Ops"), None)
    steps_tid = next((tid for (pid, tid), n in lanes.items()
                      if pid == device_pid and n == "Steps"), None)
    dur = defaultdict(float)
    n_steps = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") != device_pid:
            continue
        if e.get("tid") == ops_tid:
            dur[e["name"]] += float(e.get("dur", 0.0))
        elif e.get("tid") == steps_tid:
            n_steps += 1
    return dur, max(n_steps, 1)


def parse_hlo(path: str):
    """(instruction -> called computation, computation -> body text)."""
    hlo = open(path).read()
    inst_to_comp = {}
    for m in re.finditer(
            r"%([\w.\-]+) = [^=\n]*fusion\([^\n]*calls=%?([\w.\-]+)", hlo):
        inst_to_comp[m.group(1)] = m.group(2)
    bodies = {}
    for p in re.split(r"\n(?=%?[\w.\-]+ \([^)]*\) -> )", hlo):
        m = re.match(r"%?([\w.\-]+) \(", p)
        if m:
            bodies[m.group(1)] = p
    return hlo, inst_to_comp, bodies


def classify_body(body: str) -> str:
    if "convolution" in body:
        return "conv"
    if "dot(" in body:
        return "matmul"
    if "select-and-scatter" in body:
        return "maxpool_bwd"
    if "reduce-window" in body:
        return "pool"
    if "reduce(" in body:
        return "reduce(BN stats/bwd)"
    return "elementwise/other"


def bucket_tables(dur, n_steps, hlo, inst_to_comp, bodies):
    """Attribute device time by (direction x kind) and (stage x ...).

    Direction comes from the op_name metadata (``transpose(jvp`` = bwd),
    stage from the module path, kind from the fused computation's content
    (conv window size distinguishes pointwise / 3x3 / weight-grad convs).
    """
    inst_meta = {}
    for m in re.finditer(r"%([\w.\-]+) = [^\n]*?op_name=\"([^\"]+)\"", hlo):
        inst_meta.setdefault(m.group(1), m.group(2))

    def bucket(name):
        meta = inst_meta.get(name, "")
        body = bodies.get(inst_to_comp.get(name, ""), "")
        direction = ("bwd" if "transpose(jvp" in meta
                     else ("fwd" if "jvp" in meta else "opt/other"))
        m = re.search(r"stage(\d)", meta)
        stage = f"stage{m.group(1)}" if m else "stem/other"
        if "convolution" in body:
            kinds = re.findall(r"convolution\(.*?window=\{size=(\S+?)[ }]",
                               body)
            kind = "conv[" + ",".join(sorted(set(kinds))) + "]"
        elif "select-and-scatter" in body or "select_and_scatter" in name:
            kind = "maxpool_bwd"
        elif "reduce-window" in body:
            kind = "pool"
        elif "reduce(" in body:
            kind = "reduce"
        elif name.startswith(("copy", "slice", "bitcast", "reshape")):
            kind = "copy"
        else:
            kind = "elementwise"
        return direction, stage, kind

    by_dir_kind = defaultdict(float)
    by_stage = defaultdict(float)
    for name, d in dur.items():
        dr, st, kd = bucket(name)
        by_dir_kind[(dr, kd)] += d
        by_stage[(st, dr, kd)] += d
    total = sum(dur.values())
    print("== direction x kind ==")
    for k, v in sorted(by_dir_kind.items(), key=lambda kv: -kv[1]):
        print(f"{v / n_steps / 1e3:8.2f} ms {100 * v / total:5.1f}%  {k}")
    print("\n== stage x direction x kind (top 25) ==")
    for k, v in sorted(by_stage.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v / n_steps / 1e3:8.2f} ms {100 * v / total:5.1f}%  {k}")
    print()


def main(argv):
    root = argv[0] if argv else "/tmp/osi_trace"
    top_n = int(argv[1]) if len(argv) > 1 and argv[1].isdigit() else 30
    hlo_path = None
    if "--hlo" in argv:
        hlo_path = argv[argv.index("--hlo") + 1]

    trace = find_trace(root)
    dur, n_steps = load_device_ops(trace)
    total = sum(dur.values())
    print(f"trace: {trace}")
    print(f"device op time: {total / 1e3:.2f} ms over {n_steps} steps "
          f"-> {total / n_steps / 1e3:.2f} ms/step\n")

    if hlo_path:
        hlo, inst_to_comp, bodies = parse_hlo(hlo_path)
        cat = defaultdict(float)
        for name, d in dur.items():
            comp = inst_to_comp.get(name)
            if comp and comp in bodies:
                cat[classify_body(bodies[comp])] += d
            elif name.startswith(("copy", "slice", "bitcast", "reshape")):
                cat["copy/slice"] += d
            else:
                m = re.search(rf"%{re.escape(name)} = [^\n]*", hlo)
                cat[classify_body(m.group(0)) if m else "unmatched"] += d
        print("== by HLO category ==")
        for k, v in sorted(cat.items(), key=lambda kv: -kv[1]):
            print(f"{v / n_steps / 1e3:8.2f} ms/step  "
                  f"{100 * v / total:5.1f}%  {k}")
        print()
        if "--buckets" in argv:
            bucket_tables(dur, n_steps, hlo, inst_to_comp, bodies)

    print(f"== top {top_n} instances ==")
    for k, v in sorted(dur.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{v / n_steps / 1e3:8.3f} ms/step  {100 * v / total:5.1f}%  "
              f"{k[:90]}")


if __name__ == "__main__":
    main(sys.argv[1:])
