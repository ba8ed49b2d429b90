"""Benchmark: batched TTS synthesis throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "audio_seconds_per_second_per_chip", "value": N, "unit": "x_realtime",
   "vs_baseline": N, ...}

Headline config (BASELINE.md): 64-utterance batched synthesis, 10 Euler ODE steps,
full-size MatchaTTS (default reference hyperparameters), mel budget 512 frames
(~5.9 s audio per utterance). `vs_baseline` is the speedup over real-time synthesis
(1.0 = generates audio exactly as fast as it plays), the reference's own RTF metric
(`matcha_tts.py:235-236`, RTF = wall * 22050 / (frames * 256); we report 1/RTF).

Extra context fields record the MAS kernel's speedup over the C++/OpenMP CPU reference
(the reference repo's only perf claim, README "10-100x plus rapide").
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_synthesis(batch=64, tx=64, ty=512, n_timesteps=10, iters=5, bf16=False):
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params

    model = MatchaTTS(MatchaConfig())
    params = init_params(model, jax.random.PRNGKey(0))
    if bf16:
        from matcha_tpu.models.precision import bf16_serving

        params = bf16_serving(params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(3, 140, size=(batch, tx)), jnp.int32)
    xl = jnp.full((batch,), tx, jnp.int32)

    def fn(params, x, xl, key):
        out = model.apply(
            {"params": params}, x, xl, ty, n_timesteps,
            method=MatchaTTS.synthesise_fixed, rngs={"noise": key},
        )
        return out["mel"]

    # NOTE on methodology: block_until_ready does not synchronize through the axon
    # tunnel, and each synchronous host call pays ~28 ms of tunnel round-trip latency.
    # So (a) timing forces a scalar device->host transfer, and (b) `inner` repetitions
    # run in-graph via lax.scan so the latency amortizes out of the per-batch number.
    inner = 4

    def repeated(params, x, xl, key):
        def body(acc, k):
            return acc + jnp.sum(fn(params, x, xl, k)), None

        keys = jax.random.split(key, inner)
        acc, _ = jax.lax.scan(body, 0.0, keys)
        return acc

    jfn = jax.jit(repeated)
    float(jfn(params, x, xl, jax.random.PRNGKey(1)))  # compile + run

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(jfn(params, x, xl, jax.random.PRNGKey(i)))
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times)) / inner
    audio_seconds = batch * ty * 256 / 22050.0
    return audio_seconds / wall, wall, audio_seconds


def bench_mas(b=32, tx=150, ty=800, iters=10):
    """MAS kernel vs the C++/OpenMP CPU reference (reference bench shape, largest)."""
    from matcha_tpu.ops import maximum_path_pallas
    from matcha_tpu.ops.mas_cpp import maximum_path_cpp

    rng = np.random.default_rng(0)
    value = rng.standard_normal((b, tx, ty)).astype(np.float32)
    t_x = rng.integers(tx // 2, tx + 1, size=b)
    t_y = np.maximum(rng.integers(ty // 2, ty + 1, size=b), t_x)
    x_mask = (np.arange(tx)[None] < t_x[:, None]).astype(np.float32)
    y_mask = (np.arange(ty)[None] < t_y[:, None]).astype(np.float32)
    mask = x_mask[:, :, None] * y_mask[:, None, :]

    jv, jm = jnp.asarray(value), jnp.asarray(mask)
    inner = 16  # in-graph repeats to amortize the ~28 ms tunnel round trip

    def mas_rep(v, m):
        def body(acc, i):
            # vary the input so XLA cannot CSE the iterations
            return acc + jnp.sum(maximum_path_pallas(v + acc * 0.0 + i * 0.0, m)), None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(inner, dtype=jnp.float32))
        return acc

    mas_sum = jax.jit(mas_rep)
    float(mas_sum(jv, jm))  # compile + run (scalar transfer = real sync, see above)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(mas_sum(jv, jm))
    t_pallas = (time.perf_counter() - t0) / iters / inner

    maximum_path_cpp(value, mask)
    t0 = time.perf_counter()
    for _ in range(iters):
        maximum_path_cpp(value, mask)
    t_cpp = (time.perf_counter() - t0) / iters
    return t_cpp / t_pallas, t_pallas * 1e3, t_cpp * 1e3


def main():
    import os

    from matcha_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.default_backend()
    xrt, wall, audio_s = bench_synthesis()
    bf16_xrt = None
    if os.environ.get("MATCHA_BENCH_BF16"):
        # Serving mode: bf16 parameters/activations (matcha_tpu.models.precision).
        bf16_xrt, _, _ = bench_synthesis(iters=3, bf16=True)
    try:
        mas_speedup, mas_pallas_ms, mas_cpp_ms = bench_mas()
    except Exception as e:  # C++ toolchain missing etc.
        mas_speedup = mas_pallas_ms = mas_cpp_ms = None
        print(f"mas bench skipped: {e}", file=sys.stderr)

    result = {
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 1.0, 2),
        "backend": backend,
        "batch": 64,
        "ode_steps": 10,
        "wall_s_per_batch": round(wall, 4),
        "audio_s_per_batch": round(audio_s, 2),
        "mas_pallas_vs_cpp_speedup": None if mas_speedup is None else round(mas_speedup, 2),
        "mas_pallas_ms": None if mas_pallas_ms is None else round(mas_pallas_ms, 2),
        "mas_cpp_ms": None if mas_cpp_ms is None else round(mas_cpp_ms, 2),
        "bf16_x_realtime": None if bf16_xrt is None else round(bf16_xrt, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
