#!/usr/bin/env python
"""Summarize a jax.profiler Perfetto trace: device time per op class.

Usage: python scripts/trace_summary.py output/traces/p64/celeba [top_n]

Reads the newest plugins/profile/*/\\*.trace.json.gz under the given dir,
aggregates complete-event durations on device lanes, and prints the top
op classes by total device time — the evidence the 64x64 "why only 38%
of peak" question needs (host-side analysis; no chip time used).
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(root):
    cands = sorted(glob.glob(os.path.join(
        root, "plugins", "profile", "*", "*.trace.json.gz")))
    if not cands:
        cands = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                                 recursive=True))
    if not cands:
        sys.exit(f"no trace.json.gz under {root}")
    path = cands[-1]
    print(f"reading {path}")
    with gzip.open(path, "rt") as f:
        return json.load(f)


def classify(name):
    """Collapse XLA op names into coarse classes."""
    n = name.lower()
    for pat, cls in (
            (r"conv", "convolution"),
            (r"dot|matmul", "matmul"),
            (r"fusion", "fusion(elementwise)"),
            (r"copy|transpose|reshape|bitcast", "layout/copy"),
            (r"dynamic-slice|dynamic_update|gather|scatter", "slice/gather"),
            (r"all-reduce|collective", "collective"),
            (r"infeed|outfeed|send|recv", "transfer"),
            (r"custom-call", "custom-call"),
    ):
        if re.search(pat, n):
            return cls
    return "other"


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    data = load_trace(root)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # map pid/tid -> lane name; keep device-ish lanes (TensorCore / XLA Ops)
    lanes = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e.get("pid"), e.get("tid"))] = \
                e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "process_name":
            lanes[(e.get("pid"), None)] = e.get("args", {}).get("name", "")

    def lane_of(e):
        return (lanes.get((e.get("pid"), e.get("tid")))
                or lanes.get((e.get("pid"), None)) or "")

    per_op = collections.Counter()
    per_class = collections.Counter()
    lane_total = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = lane_of(e)
        lane_total[lane] += e["dur"]
        if not re.search(r"tensorcore|xla op|stream|core",
                         lane, re.IGNORECASE):
            continue
        name = e.get("name", "?")
        per_op[name] += e["dur"]
        per_class[classify(name)] += e["dur"]

    print("\n== lanes (total us) ==")
    for lane, us in lane_total.most_common(12):
        print(f"  {us/1e3:10.2f} ms  {lane!r}")
    total = sum(per_class.values())
    if total:
        print(f"\n== device time by op class (total {total/1e3:.2f} ms) ==")
        for cls, us in per_class.most_common():
            print(f"  {us/total:6.1%}  {us/1e3:10.2f} ms  {cls}")
        print(f"\n== top {top_n} ops ==")
        for name, us in per_op.most_common(top_n):
            print(f"  {us/total:6.1%}  {us/1e3:9.2f} ms  {name[:100]}")
    else:
        print("\nno device-lane events matched; lanes above show what "
              "exists — adjust the lane regex")


if __name__ == "__main__":
    main()
