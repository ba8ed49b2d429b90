"""Offered-load -> latency/throughput curve for the serving engine (r4 verdict
item 2): closed-loop clients (default 1/2/4/8/16 threads, configurable via
--threads) driving the pipelined batching front-end at the tuned serving
config (bf16, 10 ODE steps, HiFi-GAN, int16 wire). Reports per-thread-count
requests/s, p50/p99 request latency, p50 own-compute wall, and mean group
size — the curve that shows where the batching knee is and whether the ~25 ms
tunnel RPC floor binds. --max-batch/--mel-budgets select the engine variant
(one budget = the zero-sync pipeline); --append-to adds tagged rows to an
existing artifact (used for the r5 knee-extension levels).

Usage: python tools/serve_load_curve.py [--out artifacts/serve_load_r5.json]
       python tools/serve_load_curve.py --threads 32 48 --max-batch 16 \
           --mel-budgets 256 --append-to artifacts/serve_load_r5.json
"""

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(eng, texts, threads: int, n_requests: int):
    lat_ms, wall_ms, group_sizes = [], [], []
    lock = threading.Lock()
    idx = {"i": 0}

    def client():
        while True:
            with lock:
                i = idx["i"]
                if i >= n_requests:
                    return
                idx["i"] += 1
            _, info = eng.serve(texts[i % len(texts)], seed=i)
            with lock:
                lat_ms.append(info["latency_s"] * 1e3)
                wall_ms.append(info["wall_s"] * 1e3)
                group_sizes.append(info["group_size"])

    t0 = time.perf_counter()
    pool = [threading.Thread(target=client) for _ in range(threads)]
    for t in pool:
        t.start()
    for t in pool:
        t.join()
    wall = time.perf_counter() - t0

    import numpy as np

    lat = np.asarray(lat_ms)
    return {
        "threads": threads,
        "n_requests": n_requests,
        "requests_per_s": round(n_requests / wall, 1),
        "p50_ms": round(float(np.percentile(lat, 50)), 1),
        "p90_ms": round(float(np.percentile(lat, 90)), 1),
        "p99_ms": round(float(np.percentile(lat, 99)), 1),
        "wall_p50_ms": round(float(np.median(wall_ms)), 1),
        "mean_group_size": round(float(np.mean(group_sizes)), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts/serve_load_r5.json"))
    ap.add_argument("--per-thread", type=int, default=8,
                    help="requests per client thread at each level")
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 2, 4, 8, 16],
                    help="closed-loop client counts to sweep")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--mel-budgets", type=int, nargs="+", default=[256, 512],
                    help="one value = the zero-sync single-budget engine")
    ap.add_argument("--max-wait-ms", type=float, default=5.0,
                    help="batching window; longer waits fill bigger groups")
    ap.add_argument("--append-to", default=None,
                    help="append rows (tagged with this run's config) to an "
                         "existing artifact instead of writing a fresh one")
    args = ap.parse_args()

    import bench

    eng = bench._full_size_engine(steps=10, max_batch=args.max_batch,
                                  mel_budgets=tuple(args.mel_budgets))
    texts = [
        "the quick brown fox jumps over the lazy sleeping dog today",
        "flow matching synthesis runs fast on tensor processing units",
        "monotonic alignment search now runs directly on the accelerator",
        "this sentence exists to measure serving latency percentiles now",
    ]
    warm = sorted({1, 2, 4, args.max_batch} | {b for b in (8, 16) if b < args.max_batch})
    eng.warmup(batch_sizes=tuple(warm), text=texts[0])

    # solo reference: the unloaded single-request path through the same worker
    eng.start_batching(max_wait_ms=args.max_wait_ms)
    rows = []
    zero_sync = len(args.mel_budgets) == 1
    for threads in args.threads:
        n = max(16, args.per_thread * threads)
        row = run_level(eng, texts, threads, n)
        if args.append_to or args.max_batch != 8:
            row["max_batch"] = args.max_batch
            row["mel_budgets"] = list(args.mel_budgets)
            if args.max_wait_ms != 5.0:
                row["max_wait_ms"] = args.max_wait_ms
            if zero_sync:
                row["zero_sync"] = True
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)
    eng.stop_batching()

    if args.append_to:
        with open(args.append_to) as f:
            out = json.load(f)
        out["rows"].extend(rows)
        with open(args.append_to, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({"appended_to": args.append_to, "n_new": len(rows)}))
        return

    out = {
        "config": {"steps": 10, "precision": "bf16", "vocoder": "hifigan",
                   "wire": "int16", "max_batch": eng.cfg.max_batch,
                   "max_wait_ms": args.max_wait_ms,
                   "mel_budgets": list(eng.cfg.mel_budgets)},
        "note": "closed-loop clients; latency = enqueue->delivery; wall = the "
                "request's own compute path (shared encode + its sub-group's "
                "fused dispatch incl. pipeline wait).",
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": args.out, "n_rows": len(rows)}))


if __name__ == "__main__":
    main()
