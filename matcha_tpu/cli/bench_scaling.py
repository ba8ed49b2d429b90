"""Data-parallel scaling benchmark.

Measures training-step throughput (utterances/s) at mesh sizes 1..N and reports scaling
efficiency (BASELINE.md multi-host config). On a single-chip or chip-less host it uses
virtual CPU devices — the collective/sharding structure is identical to a real slice, so
this validates the scaling path; absolute numbers come from real hardware.

Usage:
    python -m matcha_tpu.cli.bench_scaling [--devices 8] [--batch-per-device 4] [--cpu]
"""

import argparse
import json
import time


def main():
    from matcha_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch-per-device", type=int, default=4)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true", help="force virtual CPU devices")
    ap.add_argument("--out", help="write the result table to this JSON file")
    args = ap.parse_args()

    import jax

    if args.cpu or len(jax.devices()) < args.devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)

    import jax.numpy as jnp

    from matcha_tpu.audio.mel import MelConfig
    from matcha_tpu.data.dataset import DataConfig, SyntheticDataset, collate
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params
    from matcha_tpu.parallel import batch_sharding, make_mesh, shard_params
    from matcha_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

    import numpy as np

    model = MatchaTTS(MatchaConfig())
    # keep the master copy on HOST: the jitted step donates its device params, and a
    # donated buffer must not be the one reused to seed the next mesh size
    base_params = jax.tree.map(np.asarray, init_params(model, jax.random.PRNGKey(0)))
    train_cfg = TrainConfig(accumulate_steps=1, mas_impl="auto", log_grad_norm=False)

    results = []
    n_avail = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= min(args.devices, n_avail)]
    for nd in sizes:
        mesh = make_mesh(data=nd, model=1, devices=jax.devices()[:nd])
        batch_size = args.batch_per_device * nd
        ds = SyntheticDataset(n_items=batch_size, mel_cfg=MelConfig(), min_frames=200,
                              max_frames=200)
        batch = collate([ds.get(i) for i in range(batch_size)],
                        DataConfig(batch_size=batch_size))
        with mesh:
            params = shard_params(mesh, base_params)
            tx = make_optimizer(train_cfg, steps_per_epoch=100)
            opt_state = tx.init(params)
            step = make_train_step(model, tx, train_cfg)
            sb = jax.device_put({k: jnp.asarray(v) for k, v in batch.items()},
                                batch_sharding(mesh))
            # TWO warm-up steps: the first compiles for device_put input layouts,
            # the second recompiles for the donated-output layouts the steady
            # state actually uses — timing after one warm-up would swallow that
            # second (~minute-scale) compile into the loop
            for w in range(2):
                params, opt_state, m = step(params, opt_state, sb, jax.random.PRNGKey(w))
                float(m["loss"])  # sync
            t0 = time.perf_counter()
            for i in range(args.steps):
                params, opt_state, m = step(params, opt_state, sb, jax.random.PRNGKey(i))
            float(m["loss"])  # sync
            wall = (time.perf_counter() - t0) / args.steps
        utt_s = batch_size / wall
        results.append({"devices": nd, "batch": batch_size, "step_s": round(wall, 4),
                        "utterances_per_s": round(utt_s, 2)})
        print(json.dumps(results[-1]))

    efficiency = {}
    if len(results) > 1:
        base = results[0]["utterances_per_s"]
        for r in results[1:]:
            eff = r["utterances_per_s"] / (base * r["devices"])
            efficiency[str(r["devices"])] = round(eff, 3)
            print(json.dumps({"devices": r["devices"], "scaling_efficiency": eff}))

    if args.out:
        from pathlib import Path

        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({
                "platform": jax.devices()[0].platform,
                "device_kind": jax.devices()[0].device_kind,
                "batch_per_device": args.batch_per_device,
                "results": results,
                "scaling_efficiency": efficiency,
            }, f, indent=1)


if __name__ == "__main__":
    main()
