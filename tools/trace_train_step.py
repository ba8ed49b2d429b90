"""Capture a device trace of the K=8 batch-128 bf16 training step for one
attn_impl/remat variant and print the per-dispatch op-category table — the
trace-delta evidence behind artifacts/train_mfu_r5.json (r4 verdict item 1).

Usage: python tools/trace_train_step.py OUT_DIR [--attn-impl pallas] [--remat dots]
"""

import argparse
import dataclasses
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--attn-impl", default="xla")
    ap.add_argument("--remat", default=None)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params
    from matcha_tpu.train.trainer import (
        TrainConfig, make_optimizer, make_train_steps_scan,
    )
    from matcha_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mcfg = MatchaConfig()
    mcfg = dataclasses.replace(mcfg, decoder=dataclasses.replace(
        mcfg.decoder, attn_impl=args.attn_impl, remat=args.remat))
    model = MatchaTTS(mcfg)
    cfg = TrainConfig(log_grad_norm=False, precision="bf16")
    tx_opt = make_optimizer(cfg, steps_per_epoch=16)
    rng = np.random.default_rng(2)
    batch, tx, ty = args.batch, 64, 512
    mel = np.cumsum(0.1 * rng.standard_normal((batch, ty, 80)), axis=1)
    batch_d = {
        "x": jnp.asarray(rng.integers(3, 140, size=(batch, tx)), jnp.int32),
        "x_lengths": jnp.full((batch,), tx, jnp.int32),
        "y": jnp.asarray(mel, jnp.float32),
        "y_lengths": jnp.full((batch,), ty, jnp.int32),
    }
    k = args.k
    stacked = {kk: jnp.stack([v] * k) for kk, v in batch_d.items()}
    keys = jax.random.split(jax.random.PRNGKey(7), 4 * k)

    params = init_params(model, jax.random.PRNGKey(0))
    opt = tx_opt.init(params)
    scan = make_train_steps_scan(model, tx_opt, cfg)
    params, opt, m = scan(params, opt, stacked, keys[:k])  # compile + run
    float(m["loss"][-1])

    jax.profiler.start_trace(args.out_dir)
    for i in (1, 2):
        params, opt, m = scan(params, opt, stacked, keys[i * k:(i + 1) * k])
    float(m["loss"][-1])
    jax.profiler.stop_trace()

    from tools.trace_table import aggregate

    rows, total = aggregate(args.out_dir)
    per_dispatch = total / 2 / 1e3  # two traced dispatches, us -> ms
    print(f"variant attn={args.attn_impl} remat={args.remat}: device "
          f"{per_dispatch:.1f} ms/dispatch ({per_dispatch / k:.1f} ms/step)")
    for name, dur in rows[:14]:
        print(f"  {dur / total * 100:5.1f}%  {dur / 2e3:8.2f} ms/dispatch  {name}")


if __name__ == "__main__":
    main()
