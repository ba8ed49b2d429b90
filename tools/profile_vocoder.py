"""Capture + aggregate a device trace of the HiFi-GAN generator serving graph.

Usage: python tools/profile_vocoder.py [--batch 8] [--frames 256] [--bf16]

Writes the jax.profiler trace under /tmp/voc_trace and prints a per-op-category
device-time table (parsed from the perfetto trace.json.gz) — the r3-verdict
"vocoder op breakdown" evidence (VERDICT.md item 5).
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def capture(batch, frames, bf16, trace_dir, upsample_impl="conv_transpose",
            resblock_impl="xla"):
    from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

    gen = Generator(HiFiGANConfig(), weight_norm=False, upsample_impl=upsample_impl,
                    resblock_impl=resblock_impl)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))["params"]
    if bf16:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, frames, 80)),
        jnp.bfloat16 if bf16 else jnp.float32,
    )

    f = jax.jit(lambda p, m: gen.apply({"params": p}, m))
    jax.block_until_ready(f(params, mel))  # compile
    import time

    times = []
    for i in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(f(params, mel))
        times.append(time.perf_counter() - t0)
    wall_ms = float(np.median(times)) * 1e3

    jax.profiler.start_trace(trace_dir)
    for _ in range(4):
        out = f(params, mel)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return wall_ms


def aggregate(trace_dir):
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        print("no perfetto trace found", file=sys.stderr)
        return {}
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # device-thread complete events: aggregate duration by HLO op category
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
        name = e.get("name", "")
        by_op[name.split(".")[0]] += e["dur"]
        total += e["dur"]
    rows = sorted(by_op.items(), key=lambda kv: -kv[1])
    return rows, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--impl", default="conv_transpose")
    ap.add_argument("--resblock", default="xla")
    ap.add_argument("--trace-dir", default="/tmp/voc_trace")
    args = ap.parse_args()

    wall_ms = capture(args.batch, args.frames, args.bf16, args.trace_dir, args.impl,
                      args.resblock)
    rows, total = aggregate(args.trace_dir)
    print(f"generator fwd ({args.batch}x{args.frames}, "
          f"{'bf16' if args.bf16 else 'fp32'}, up={args.impl}, "
          f"res={args.resblock}): {wall_ms:.2f} ms wall")
    print(f"device total (4 dispatches): {total / 1e3:.2f} ms")
    for name, dur in rows[:25]:
        print(f"  {dur / 1e3:8.3f} ms  {100 * dur / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
