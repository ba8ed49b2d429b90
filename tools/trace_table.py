"""Aggregate a jax.profiler perfetto trace into a device-time op table.

Usage: python tools/trace_table.py <trace_dir> [n_dispatches]

Parses the newest *.trace.json.gz under <trace_dir>, sums durations of device-
thread complete events by op-name prefix, and prints a table (optionally
normalized per dispatch). Used for the DESIGN.md op-breakdown evidence
(serving graph r3, vocoder + training step r4).
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def aggregate(trace_dir):
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no perfetto trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "").split(".")[0]
        by_op[name] += e["dur"]
        total += e["dur"]
    return sorted(by_op.items(), key=lambda kv: -kv[1]), total


def main():
    trace_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rows, total = aggregate(trace_dir)
    print(f"device total: {total / 1e3:.2f} ms over {n} dispatch(es)")
    for name, dur in rows[:30]:
        print(f"  {dur / 1e3 / n:9.3f} ms/disp  {100 * dur / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
