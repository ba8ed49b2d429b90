"""Round-5 training-MFU experiment matrix (r4 verdict item 1).

The r4 roofline narrative claimed the batch-128 bf16 step's ~0.194 MFU ceiling
could only move with fully-fused Pallas fwd+bwd blocks. This sweep ATTACKS that
claim with the three levers the verdict named, each measured on the real chip
with the same bench_train harness the committed r4 numbers used:

  * `attn_impl="pallas"` — the repo's fused VMEM attention kernel, now with a
    custom_vjp fused backward (ops/attention_pallas.py), inside the training
    graph at batch 128;
  * `remat={"full","dots"}` — nn.remat of every U-Net block (recompute in the
    backward instead of round-tripping saved activations through HBM);
  * XLA latency-hiding / fusion flags on the ~1,060-op step.

Each variant runs in its OWN subprocess (XLA_FLAGS must be set before backend
init; the chip is exclusive, so variants run serially). Output: one JSON row
per variant in artifacts/train_mfu_r5.json with step ms, MFU, samples/s.

Usage: python tools/train_mfu_sweep_r5.py [--iters 4] [--out artifacts/train_mfu_r5.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
import jax
import bench

cfg = json.loads(sys.argv[1])
peak = bench.PEAK_FLOPS.get(jax.devices()[0].device_kind)
t_single, t_scan, k, flops = bench.bench_train(
    batch=cfg["batch"], precision=cfg["precision"], iters=cfg["iters"], k=8,
    out_size=cfg.get("out_size"), attn_impl=cfg.get("attn_impl", "xla"),
    remat=cfg.get("remat"), accumulate_steps=cfg.get("accumulate_steps", 2),
)
row = {
    "train_step_ms_k1": round(t_single, 2),
    "train_step_ms_k8": round(t_scan, 2),
    "step_flops": flops,
    "mfu_k8": None if not (flops and peak) else round(flops / (t_scan / 1e3) / peak, 4),
    "samples_per_s_k8": round(cfg["batch"] / (t_scan / 1e3), 1),
}
print("RESULT " + json.dumps(row))
"""


def run_variant(name: str, cfg: dict, xla_flags: str = "", iters: int = 4,
                timeout_s: int = 1500):
    env = dict(os.environ)
    if xla_flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + xla_flags).strip()
        # a flag change must not hit the persistent compile cache of the default
        # flags (the cache key includes flags, but keep runs hermetic anyway)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, json.dumps(dict(cfg, iters=iters))],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=timeout_s,
    )
    row = {"variant": name, **cfg}
    if xla_flags:
        row["xla_flags"] = xla_flags
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            row.update(json.loads(line[len("RESULT "):]))
            break
    else:
        row["error"] = (proc.stderr or proc.stdout)[-400:]
    row["wall_s"] = round(time.time() - t0, 1)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts/train_mfu_r5.json"))
    ap.add_argument("--only", default=None, help="comma-separated variant filter")
    args = ap.parse_args()

    base = dict(batch=128, precision="bf16")
    variants = [
        ("base_r4", dict(base), ""),
        ("attn_pallas", dict(base, attn_impl="pallas"), ""),
        ("remat_full", dict(base, remat="full"), ""),
        ("remat_dots", dict(base, remat="dots"), ""),
        # NOTE: TPU-compiler XLA flags are UNREACHABLE in this environment —
        # the axon tunnel compiles server-side; client XLA_FLAGS knows only
        # generic/cpu/gpu flags (probed: --xla_tpu_* rejected as unknown) and
        # LIBTPU_INIT_ARGS is silently ignored (an invalid flag does not crash).
        # The two flag variants are kept for environments with a local chip.
        ("lhs_flag", dict(base), "--xla_tpu_enable_latency_hiding_scheduler=true"),
        ("aggressive_fusion", dict(base),
         "--xla_tpu_rwb_fusion=true --xla_tpu_enable_dot_strength_reduction=true"),
        ("no_accum", dict(base, accumulate_steps=1), ""),
        ("attn_pallas_remat_dots", dict(base, attn_impl="pallas", remat="dots"), ""),
    ]
    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[0] in keep]

    rows = []
    for name, cfg, flags in variants:
        print(f"=== {name} ===", file=sys.stderr)
        row = run_variant(name, cfg, flags, iters=args.iters)
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    out = {
        "device_note": "bench_train harness, tx=64 ty=512 K=8, identical to the "
                       "r4 sweep rows (artifacts/train_sweep_r4.json)",
        "baseline_r4": {"train_step_ms_k8": 85.0, "mfu_k8": 0.194},
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": args.out, "n_rows": len(rows)}))


if __name__ == "__main__":
    main()
