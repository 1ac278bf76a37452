"""Summarize a jax.profiler trace: top device ops by total duration.

Usage: python scripts/trace_top_ops.py <trace_dir> [N]

Reads the Perfetto/Chrome trace (`*.trace.json.gz`) that
`jax.profiler.start_trace` writes under
`<trace_dir>/plugins/profile/<run>/`, keeps only events on device
(TPU/accelerator) tracks, and aggregates wall time by op name — the
fastest way to answer "where does the fused graph actually spend its
time" without TensorBoard. Op names are XLA fusion names; the `tf_op` /
`name` metadata usually carries the HLO + source hint.

Groups fusions further by a coarse bucket (conv / snake / attention /
transpose / reduce / other) keyed on substrings so the per-subsystem
split is visible at a glance.
"""

import gzip
import json
import os
import re
import sys
from collections import defaultdict


def find_traces(root):
    hits = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".trace.json.gz") or f.endswith(".trace.json"):
                hits.append(os.path.join(dirpath, f))
    return sorted(hits)


def load_events(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


DEVICE_PAT = re.compile(r"/device:TPU|TPU:?\d|/device:tpu|Chip \d", re.I)


def device_pids(events):
    """pid -> process name for accelerator tracks."""
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e.get("args", {}).get("name", "")
    return {
        pid
        for pid, name in names.items()
        if DEVICE_PAT.search(name or "")
        or ("TPU" in (name or ""))
        or ("XLA Op" in (name or ""))
    }, names


def leaf_tids(events, dev_pids):
    """(pid, tid) pairs on 'XLA Ops' threads — the leaf op track.
    Module/step tracks nest whole dispatches and double-count."""
    keep = set()
    have_names = False
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            have_names = True
            if e.get("pid") in dev_pids and "XLA Ops" in (
                e.get("args", {}).get("name", "")
            ):
                keep.add((e["pid"], e["tid"]))
    return keep if have_names and keep else None


BUCKETS = (
    ("convolution", "conv"),
    ("conv", "conv"),
    ("dot", "matmul"),
    ("dynamic-slice", "slice/pad"),
    ("dynamic_slice", "slice/pad"),
    ("pad", "slice/pad"),
    ("transpose", "transpose"),
    ("copy", "copy"),
    ("reduce", "reduce"),
    ("scatter", "scatter/gather"),
    ("gather", "scatter/gather"),
    ("snake", "snake"),
    ("flash", "attention"),
    ("softmax", "attention"),
    ("attention", "attention"),
    ("fusion", "fusion(other)"),
)


def bucket(name):
    low = name.lower()
    for key, b in BUCKETS:
        if key in low:
            return b
    return "other"


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    traces = find_traces(root)
    if not traces:
        sys.exit(f"no .trace.json(.gz) under {root}")
    path = traces[-1]
    print(f"trace: {path}")
    events = load_events(path)
    dev_pids, names = device_pids(events)
    if not dev_pids:
        print("no device track matched; process names were:")
        for pid, n in sorted(names.items()):
            print(f"  pid {pid}: {n}")
        dev_pids = set(names)

    leaves = leaf_tids(events, dev_pids)
    if leaves:
        print(f"(restricting to {len(leaves)} 'XLA Ops' leaf tracks)")

    per_op = defaultdict(float)
    per_bucket = defaultdict(float)
    count = defaultdict(int)
    t_total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if leaves and (e.get("pid"), e.get("tid")) not in leaves:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        per_op[name] += dur
        count[name] += 1
        per_bucket[bucket(name)] += dur
        t_total += dur

    print(f"\ndevice busy total: {t_total/1e3:.1f} ms "
          f"(sum over {len(per_op)} distinct ops)")
    print("\n=== by bucket ===")
    for b, d in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        print(f"{d/1e3:9.1f} ms  {d/t_total*100:5.1f}%  {b}")
    print(f"\n=== top {top_n} ops ===")
    for name, d in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{d/1e3:9.1f} ms  {d/t_total*100:5.1f}%  x{count[name]:<5d} "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
