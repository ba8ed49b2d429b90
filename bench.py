"""Benchmark: the full BASELINE.md matrix on the available accelerator.

Prints ONE JSON line:
  {"metric": "audio_seconds_per_second_per_chip", "value": N, "unit": "x_realtime",
   "vs_baseline": N, ...}

Headline config: the TUNED serving path — bf16 params+activations, 128-utterance
batched synthesis, 10 Euler ODE steps, full-size MatchaTTS (default reference
hyperparameters), mel budget 512 frames (~5.9 s audio per utterance). bf16 is the
throughput-optimal configuration (artifacts/bf16_sweep.json; parity vs fp32
validated in tests/test_precision.py). `vs_baseline` is the speedup over real-time
synthesis (1.0 = generates audio exactly as fast as it plays), the reference's own
RTF metric (`matcha_tts.py:235-236`, RTF = wall * 22050 / (frames * 256); 1/RTF).

Also measured (the rest of the BASELINE.md config list):
  * the fp32 PARITY row (`fp32_x_realtime`, `fp32_mfu`): batch 64, "32-true"
    numerics matching the reference's precision (`train.py:87`);
  * the 2/4/10-step ODE sweep at batch 64 bf16 (`ode_sweep_x_realtime`);
  * single-sentence text->wav latency through BOTH vocoder paths (Griffin-Lim and
    HiFi-GAN, 50 ODE steps as `/root/reference/generate.py:55` uses) as x_realtime;
  * model FLOP utilization (`mfu`, and `train_mfu` for training) from XLA's own
    cost analysis vs the chip's bf16 peak;
  * the MAS kernel vs the C++/OpenMP CPU reference on BOTH large reference bench
    shapes ((16,100,500) and (32,150,800), `test_monotonic_align_speed.py:126`),
    OMP thread count pinned and recorded. The Pallas absolute ms is the stable,
    lead number; the speedup is contention-sensitive (2-vCPU host) and secondary.
    On-device path equality asserted (`mas_paths_equal`);
  * fused training-step time (full-size model, batch 16): fp32 single dispatch vs
    K-steps-per-dispatch lax.scan, plus the bf16 scanned step (`train_step_ms*`),
    with `train_mfu` = fwd+bwd+opt FLOPs of one step / scanned step time / peak.

Env knobs: MATCHA_BENCH_FAST=1 skips the sweep/vocoder/train extras (headline +
MAS only); MATCHA_BENCH_NO_BF16=1 skips bf16 measurements (fp32 becomes headline).
"""

import json
import os
import sys
import time

# Pin OpenMP BEFORE the MAS C++ library loads: the C++ reference timing is
# meaningless if the thread count floats with ambient load (r01 measured 28.3 ms,
# r02 10.2 ms for identical code). Recorded in the output JSON.
os.environ.setdefault("OMP_NUM_THREADS", str(os.cpu_count() or 1))

import jax
import jax.numpy as jnp
import numpy as np

SR = 22050
HOP = 256

# bf16 peak matmul FLOPs per chip by device kind (fp32 runs as bf16x3 passes on the
# MXU, so bf16 peak is the standard MFU denominator)
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,       # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
}


def _median_time(call, iters):
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        call()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _estimator_flops(batch, ty, n_feats=80):
    """XLA-reported FLOPs of ONE decoder (CFM velocity estimator) forward pass."""
    from matcha_tpu.nn.decoder import Decoder, DecoderConfig

    dec = Decoder(DecoderConfig())
    xt = jnp.zeros((batch, ty, n_feats))
    mask = jnp.ones((batch, ty, 1))
    tt = jnp.full((batch,), 0.5)
    params = dec.init(jax.random.PRNGKey(0), xt[:1, :64], mask[:1, :64], xt[:1, :64],
                      tt[:1], deterministic=True)["params"]
    f = jax.jit(lambda p: dec.apply({"params": p}, xt, mask, xt, tt, deterministic=True))
    ca = f.lower(params).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca["flops"])


def bench_synthesis(batch=64, tx=64, ty=512, n_timesteps=10, iters=5, bf16=False,
                    with_cost=False):
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
    flops = None
    if with_cost:
        # XLA's cost_analysis counts a lax.scan body ONCE regardless of trip count,
        # so analyzing the whole synthesis graph undercounts by inner*n_timesteps.
        # Instead: analyze one U-Net estimator call (the FLOP-dominant op) at the
        # bench shapes and scale by the ODE step count. Encoder/alignment FLOPs are
        # excluded (amortized once per batch, ~2 orders smaller) — MFU is a slight
        # underestimate.
        try:
            flops = n_timesteps * _estimator_flops(batch, ty)
        except Exception as e:
            print(f"cost_analysis unavailable: {e}", file=sys.stderr)
    float(jfn(params, x, xl, jax.random.PRNGKey(1)))  # compile + run
    wall = _median_time(lambda: float(jfn(params, x, xl, jax.random.PRNGKey(2))),
                        iters) / inner
    audio_seconds = batch * ty * HOP / SR
    return audio_seconds / wall, wall, audio_seconds, flops


# One sentence for EVERY single_sentence row (fused and unfused): identical text
# + identical (seed-0) params => identical predicted mel length, so the rows'
# x_realtime values are apples-to-apples (r4 verdict: the unfused rows used to
# synthesize a fixed 256-frame clip while fused rows decoded ~1 s of predicted
# audio, making x_realtime incomparable across rows).
SINGLE_SENTENCE_TEXT = "the quick brown fox jumps over the lazy sleeping dog today"


def bench_single_sentence(vocoder: str, n_timesteps=50, ty=256, iters=5):
    """Single-sentence text->wav latency (both BASELINE.md vocoder paths).

    Mirrors the inference scripts' configs: 50 ODE steps (`generate.py:55-61`),
    Griffin-Lim with 32 iterations / NNLS inverse mel, or the HiFi-GAN v1 generator
    (`generate_HifiGan.py:104-110`). Randomly initialized weights — identical FLOPs
    and memory traffic to trained ones. Returns (x_realtime, wall_s, audio_s) with
    audio_s from the model's own predicted duration of SINGLE_SENTENCE_TEXT.
    """
    from matcha_tpu.audio.mel import MelConfig
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params
    from matcha_tpu.text import simple_text_to_sequence

    model = MatchaTTS(MatchaConfig())
    params = init_params(model, jax.random.PRNGKey(0))
    mel_cfg = MelConfig()
    seq = simple_text_to_sequence(SINGLE_SENTENCE_TEXT)
    x = jnp.asarray(np.asarray(seq, np.int32)[None, :])
    xl = jnp.full((1,), len(seq), jnp.int32)

    if vocoder == "hifigan":
        from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

        gen = Generator(HiFiGANConfig(), weight_norm=False)
        gparams = gen.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 8, mel_cfg.n_mels))
        )["params"]

        def wav_fn(mel, key):
            return gen.apply({"params": gparams}, mel)
    else:
        from matcha_tpu.audio.griffin_lim import mel_to_audio

        def wav_fn(mel, key):
            return mel_to_audio(mel_cfg, jnp.swapaxes(mel, -1, -2), rng=key)

    def full(params, x, xl, key):
        out = model.apply(
            {"params": params}, x, xl, ty, n_timesteps,
            method=MatchaTTS.synthesise_fixed, rngs={"noise": key},
        )
        # (2,) [checksum, predicted mel frames]: one fetch = one tunnel sync
        return jnp.stack([jnp.sum(wav_fn(out["mel"], key)),
                          out["mel_lengths"][0].astype(jnp.float32)])

    jfn = jax.jit(full)
    res = np.asarray(jfn(params, x, xl, jax.random.PRNGKey(3)))  # compile + run
    wall = _median_time(
        lambda: np.asarray(jfn(params, x, xl, jax.random.PRNGKey(4))), iters)
    audio_seconds = float(res[1]) * HOP / SR  # the sentence's PREDICTED audio
    return audio_seconds / wall, wall, audio_seconds


def _full_size_engine(vocoder="hifigan", steps=10, bf16=True,
                      mel_budgets=(256, 512), max_batch=8):
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params
    from matcha_tpu.serve import ServeConfig, TTSEngine
    from matcha_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # direct callers (not just main()) get cached compiles

    model = MatchaTTS(MatchaConfig())
    params = init_params(model, jax.random.PRNGKey(0))
    gparams = None
    if vocoder == "hifigan":
        from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

        gen = Generator(HiFiGANConfig(), weight_norm=False)
        gparams = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))["params"]
    # int16 wire format: the production choice — device-side PCM16 quantization,
    # 4x less device->host traffic (the tunnel moves ~50 MB/s + ~25 ms RPC floor)
    cfg = ServeConfig(n_timesteps=steps, bf16=bf16, vocoder=vocoder,
                      mel_budgets=mel_budgets, max_batch=max_batch,
                      output_dtype="int16")
    return TTSEngine(params, cfg=cfg, vocoder_params=gparams)


def bench_serve_latency(n_requests=32, threads=8, steps=10, max_batch=8,
                        eng=None, closed_loop=False):
    """p50/p99 request latency through the concurrent batching front-end.

    Drives the production serve() path — threaded requests, max-wait batching,
    pipelined per-budget fused decode dispatch — at the tuned serving config
    (bf16, 10 ODE steps, HiFi-GAN) and reports the request-latency distribution
    (`latency_s`: enqueue -> delivery) plus the honest per-request compute time
    (`wall_s`: shared encode + own sub-group dispatch). Texts share one padded
    text bucket so warmup covers every compiled shape. The default args are the
    r4-comparable row; main() also reports a THROUGHPUT-tuned row (zero-sync
    single-budget engine, 16-batch groups, 32 closed-loop clients — the
    measured knee of artifacts/serve_load_r5.json, ~265-300 req/s sustained).
    """
    import threading as _threading

    if eng is None:
        eng = _full_size_engine(steps=steps, max_batch=max_batch)
    else:
        max_batch = eng.cfg.max_batch  # warmup + report the engine's own value
    # all in the 64-token text bucket -> one encode/fused-graph family
    texts = [
        "the quick brown fox jumps over the lazy sleeping dog today",
        "flow matching synthesis runs fast on tensor processing units",
        "monotonic alignment search now runs directly on the accelerator",
        "this sentence exists to measure serving latency percentiles now",
    ]
    warm = sorted({1, 2, 4, 8, max_batch})
    eng.warmup(batch_sizes=tuple(b for b in warm if b <= max_batch),
               text=texts[0])
    eng.start_batching(max_wait_ms=5)
    lat_ms, wall_ms, group_sizes = [], [], []
    lock = _threading.Lock()

    def worker(i):
        _, info = eng.serve(texts[i % len(texts)], seed=i)
        with lock:
            lat_ms.append(info["latency_s"] * 1e3)
            wall_ms.append(info["wall_s"] * 1e3)
            group_sizes.append(info["group_size"])

    t_start = time.perf_counter()
    if closed_loop:
        # persistent closed-loop clients (the offered-load model of
        # tools/serve_load_curve.py): per-request thread spawn on a 2-core host
        # throttles arrival at high concurrency and under-fills groups
        nxt = {"i": 0}

        def client():
            while True:
                with lock:
                    i = nxt["i"]
                    if i >= n_requests:
                        return
                    nxt["i"] += 1
                worker(i)

        pool = [_threading.Thread(target=client) for _ in range(threads)]
        for t in pool:
            t.start()
        for t in pool:
            t.join()
    else:
        pool = []
        for i in range(n_requests):
            t = _threading.Thread(target=worker, args=(i,))
            t.start()
            pool.append(t)
            if len(pool) >= threads:
                pool.pop(0).join()
        for t in pool:
            t.join()
    wall_total = time.perf_counter() - t_start
    eng.stop_batching()
    lat = np.asarray(lat_ms)
    return {
        "p50": round(float(np.percentile(lat, 50)), 1),
        "p99": round(float(np.percentile(lat, 99)), 1),
        "wall_p50": round(float(np.median(wall_ms)), 1),
        "requests_per_s": round(n_requests / wall_total, 1),
        "mean_group_size": round(float(np.mean(group_sizes)), 2),
        "n": n_requests, "threads": threads, "steps": steps,
        "max_batch": max_batch, "precision": "bf16", "vocoder": "hifigan",
    }


def bench_single_sentence_fused(vocoder: str, steps=50, budget=256, iters=5):
    """Single-sentence latency through the engine's one-dispatch fused path
    (synthesise_lowlatency) at tuned serving precision (bf16) — the latency-mode
    counterpart of bench_single_sentence's fp32 reference rows (same 50 ODE
    steps, `/root/reference/generate.py:55`)."""
    eng = _full_size_engine(vocoder=vocoder, steps=steps, mel_budgets=(budget,),
                            max_batch=1)
    text = SINGLE_SENTENCE_TEXT  # same sentence as the unfused rows (see above)
    eng.synthesise_lowlatency(text, seed=0)  # compile
    wall = _median_time(lambda: eng.synthesise_lowlatency(text, seed=1), iters)
    _, info = eng.synthesise_lowlatency(text, seed=1)
    audio_seconds = info["mel_lengths"][0] * HOP / SR
    return audio_seconds / wall, wall, audio_seconds


def bench_train(batch=16, tx=64, ty=512, k=8, iters=6, precision="fp32",
                out_size=None, attn_impl="xla", remat=None, accumulate_steps=2):
    """Fused training-step throughput: single dispatch vs K-steps-per-dispatch scan.

    The full-size fused step (encoder + Pallas MAS + CFM U-Net fwd/bwd + AdamW,
    reference hyperparameters incl. 2-step accumulation) at the evidence-run batch
    size. Through a remote-device tunnel a single dispatch pays ~28 ms of host
    latency; `steps_per_dispatch=K` (train.trainer) amortizes it — both numbers are
    reported so the dispatch overhead is visible.

    Returns (t_single_ms, t_scan_ms_per_step, k, step_flops): step_flops is XLA's
    cost analysis of ONE un-scanned fused step (encoder + MAS + U-Net fwd/bwd +
    optimizer), the numerator of train_mfu.
    """
    import dataclasses

    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params
    from matcha_tpu.train.trainer import (
        TrainConfig, make_optimizer, make_train_step, make_train_steps_scan,
    )

    mcfg = MatchaConfig()
    if attn_impl != "xla" or remat is not None:
        mcfg = dataclasses.replace(mcfg, decoder=dataclasses.replace(
            mcfg.decoder, attn_impl=attn_impl, remat=remat))
    model = MatchaTTS(mcfg)
    cfg = TrainConfig(log_grad_norm=False, precision=precision, out_size=out_size,
                      accumulate_steps=accumulate_steps)
    tx_opt = make_optimizer(cfg, steps_per_epoch=16)
    rng = np.random.default_rng(2)
    mel = np.cumsum(0.1 * rng.standard_normal((batch, ty, 80)), axis=1)
    batch_d = {
        "x": jnp.asarray(rng.integers(3, 140, size=(batch, tx)), jnp.int32),
        "x_lengths": jnp.full((batch,), tx, jnp.int32),
        "y": jnp.asarray(mel, jnp.float32),
        "y_lengths": jnp.full((batch,), ty, jnp.int32),
    }
    keys = jax.random.split(jax.random.PRNGKey(7), 2 * iters * k + k)

    # single dispatch — params/opt donated, so rebuild state per timing run
    def fresh():
        params = init_params(model, jax.random.PRNGKey(0))
        return params, tx_opt.init(params)

    step = make_train_step(model, tx_opt, cfg)
    params, opt = fresh()
    step_flops = None
    try:
        ca = step.lower(params, opt, batch_d, keys[0]).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        step_flops = float(ca["flops"])
    except Exception as e:
        print(f"train cost_analysis unavailable: {e}", file=sys.stderr)
    params, opt, m = step(params, opt, batch_d, keys[0])  # compile
    float(m["loss"])
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        params, opt, m = step(params, opt, batch_d, keys[1 + i])
        float(m["loss"])  # scalar transfer = real sync through the tunnel
        times.append(time.perf_counter() - t0)
    t_single = float(np.median(times))

    scan = make_train_steps_scan(model, tx_opt, cfg)
    stacked = {kk: jnp.stack([v] * k) for kk, v in batch_d.items()}
    params, opt = fresh()
    params, opt, mk = scan(params, opt, stacked, keys[iters : iters + k])  # compile
    float(mk["loss"][-1])
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        # offset past the warm-up keys (keys[iters:iters+k]) so no timed dispatch
        # reuses the warm-up rng sequence
        params, opt, mk = scan(
            params, opt, stacked, keys[iters + (i + 1) * k : iters + (i + 2) * k]
        )
        float(mk["loss"][-1])
        times.append(time.perf_counter() - t0)
    t_scan = float(np.median(times)) / k
    return t_single * 1e3, t_scan * 1e3, k, step_flops


def mas_fused_check(batch=128):
    """Pallas MAS inside the FULL fused training-loss graph == lax.scan reference.

    Regression guard for an XLA:TPU miscompile found in r4: in the full-size
    batch-128 compute_losses graph, the `mask[:, 0, :].sum(axis=1)` mel-length
    derivation came back off by exactly 64 per sample (all other reductions of
    the same mask correct), collapsing the MAS band into invalid zero-duration
    alignments. Fixed by passing x/y lengths into the kernel explicitly
    (models/matcha.py, ops/mas_pallas.py). Standalone-kernel equality
    (bench_mas) cannot catch this class — only the fused graph does.
    """
    from matcha_tpu.data.dataset import DataConfig, SyntheticDataset, batch_iterator
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params

    model = MatchaTTS(MatchaConfig())
    params = init_params(model, jax.random.PRNGKey(0))
    ds = SyntheticDataset(n_items=2048, seed=0)
    b = next(batch_iterator(ds, DataConfig(batch_size=batch), epoch=0))
    b.pop("n_real", None)
    b = {k: jnp.asarray(v) for k, v in b.items()}
    attn = {}
    for impl in ("ref", "pallas"):
        attn[impl] = np.asarray(jax.jit(lambda p, bb, i=impl: model.apply(
            {"params": p}, bb["x"], bb["x_lengths"], bb["y"], bb["y_lengths"],
            deterministic=True, mas_impl=i, method=MatchaTTS.compute_losses,
            rngs={"cfm": jax.random.PRNGKey(1)},
        ))(params, b)["attn"])
    return bool(np.array_equal(attn["ref"], attn["pallas"]))


def bench_mas(b=32, tx=150, ty=800, iters=10):
    """MAS kernel vs the C++/OpenMP CPU reference at one reference bench shape.

    Also asserts on-device path equality: the Pallas kernel's alignment must match
    the C++ DP bit-for-bit (both are exact argmax DPs over the same scores).
    The Pallas absolute time is the lead number; the C++ time (and therefore the
    speedup) is contention-sensitive on a small shared host even with
    OMP_NUM_THREADS pinned — treat it as context, not a headline.
    """
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

    # correctness first: committed evidence that the TPU kernel's paths equal the
    # C++ reference on this (the largest reference bench) shape
    path_pallas = np.asarray(jax.jit(maximum_path_pallas)(jv, jm))
    path_cpp = maximum_path_cpp(value, mask)
    paths_equal = bool(np.array_equal(path_pallas, path_cpp))

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
    return t_cpp / t_pallas, t_pallas * 1e3, t_cpp * 1e3, paths_equal


def train_sweep(out_path="artifacts/train_sweep_r4.json"):
    """Training-throughput sweep on the real chip (r3 verdict item 1):
    batch {16,32,64,128} x precision {bf16,fp32} x K {1,8} x out_size {None,256}
    at full model size (tx=64, ty=512). Writes one JSON artifact with per-config
    step times, MFU (XLA cost analysis / bf16 peak), and samples/s. batch=16
    fp32 is the reference-parity row (`/root/reference/train.py:81-102`); the
    fastest row becomes the documented training recipe.
    """
    from matcha_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)
    configs = []
    for batch in (16, 32, 64, 128):
        for out_size in (None, 256):
            configs.append(dict(batch=batch, precision="bf16", out_size=out_size))
    configs.append(dict(batch=16, precision="fp32", out_size=None))
    configs.append(dict(batch=128, precision="fp32", out_size=None))

    rows = []
    for c in configs:
        t0 = time.time()
        try:
            t_single, t_scan, k, flops = bench_train(iters=4, k=8, **c)
        except Exception as e:
            rows.append(dict(c, error=str(e)[:300]))
            print(f"sweep row {c} failed: {e}", file=sys.stderr)
            continue
        row = dict(
            c,
            train_step_ms_k1=round(t_single, 2),
            train_step_ms_k8=round(t_scan, 2),
            step_flops=flops,
            mfu_k1=None if not (flops and peak) else round(flops / (t_single / 1e3) / peak, 4),
            mfu_k8=None if not (flops and peak) else round(flops / (t_scan / 1e3) / peak, 4),
            samples_per_s_k8=round(c["batch"] / (t_scan / 1e3), 1),
            wall_s=round(time.time() - t0, 1),
        )
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    out = {
        "device": jax.devices()[0].device_kind,
        "tx": 64, "ty": 512, "k": 8, "iters": 4,
        "peak_flops_bf16": peak,
        "note": "t_single = one fused step per dispatch (K=1); t_scan = per-step "
                "time of an 8-step lax.scan dispatch. MFU = XLA-reported step "
                "FLOPs / time / bf16 peak.",
        "rows": rows,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": out_path, "n_rows": len(rows)}))


def main():
    from matcha_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.default_backend()
    fast = bool(os.environ.get("MATCHA_BENCH_FAST"))
    no_bf16 = bool(os.environ.get("MATCHA_BENCH_NO_BF16"))
    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)

    def _mfu(flops, wall):
        return None if (flops is None or peak is None) else flops / wall / peak

    # fp32 parity row: reference "32-true" numerics at batch 64
    fp32_xrt, fp32_wall, _, fp32_flops = bench_synthesis(batch=64, with_cost=True)
    fp32_mfu = _mfu(fp32_flops, fp32_wall)

    # headline: tuned bf16 serving at the throughput-optimal batch (128 —
    # artifacts/bf16_sweep.json; beyond that HBM-resident activations win nothing)
    if no_bf16:
        xrt, wall, audio_s, mfu, batch = fp32_xrt, fp32_wall, 64 * 512 * HOP / SR, fp32_mfu, 64
        precision = "fp32"
    else:
        xrt, wall, audio_s, flops = bench_synthesis(batch=128, bf16=True, with_cost=True)
        mfu, batch, precision = _mfu(flops, wall), 128, "bf16"

    ode_sweep = {}
    single = {}
    serve_latency = serve_throughput = serve_zero_sync = None
    if not fast:
        for steps in (2, 4, 10):
            s_xrt, _, _, _ = bench_synthesis(n_timesteps=steps, iters=3, bf16=not no_bf16)
            ode_sweep[str(steps)] = round(s_xrt, 1)
        for voc in ("griffin_lim", "hifigan"):
            v_xrt, v_wall, v_audio = bench_single_sentence(voc, iters=3)
            single[voc] = {"x_realtime": round(v_xrt, 1), "wall_s": round(v_wall, 4),
                           "audio_s": round(v_audio, 3)}
        if not no_bf16:
            try:
                for voc in ("griffin_lim", "hifigan"):
                    f_xrt, f_wall, f_audio = bench_single_sentence_fused(voc, iters=3)
                    single[voc + "_fused_bf16"] = {
                        "x_realtime": round(f_xrt, 1), "wall_s": round(f_wall, 4),
                        "audio_s": round(f_audio, 3)}
                serve_latency = bench_serve_latency()
                # throughput-tuned row: the measured knee of the offered-load
                # curve (artifacts/serve_load_r5.json) — ZERO-SYNC single-budget
                # engine, 16-batch groups, 32 closed-loop clients (~265-300
                # req/s sustained; multi-budget at the same load reaches only
                # ~139 req/s because the per-group length-read sync binds)
                serve_throughput = bench_serve_latency(
                    n_requests=256, threads=32, closed_loop=True,
                    eng=_full_size_engine(steps=10, mel_budgets=(256,),
                                          max_batch=16))
                serve_throughput["mel_budgets"] = [256]
                serve_throughput["zero_sync"] = True
                # zero-sync row: a single-budget engine needs no predicted-
                # length host read — stage A is fully asynchronous (serve.py
                # _dispatch_group); the latency-optimal serve() deployment
                serve_zero_sync = bench_serve_latency(
                    n_requests=32, threads=8,
                    eng=_full_size_engine(steps=10, mel_budgets=(256,),
                                          max_batch=8))
                serve_zero_sync["mel_budgets"] = [256]
            except Exception as e:
                print(f"serve latency bench skipped: {e}", file=sys.stderr)

    train_ms = train_scan_ms = scan_k = train_mfu = None
    train_scan_bf16_ms = train_mfu_bf16 = train_tuned = None
    if not fast:
        try:
            train_ms, train_scan_ms, scan_k, step_flops = bench_train()
            if step_flops:
                train_mfu = _mfu(step_flops, train_scan_ms / 1e3)
            if not no_bf16:
                _, train_scan_bf16_ms, _, bf16_flops = bench_train(
                    precision="bf16", iters=4
                )
                if bf16_flops:
                    train_mfu_bf16 = _mfu(bf16_flops, train_scan_bf16_ms / 1e3)
        except Exception as e:
            print(f"train bench skipped: {e}", file=sys.stderr)
        # TUNED training recipe (artifacts/train_sweep_r4.json): batch 128 is
        # the throughput/MFU peak of the committed sweep; the out_size=256 row
        # (reference-dormant random decoder crops) is the samples/s winner.
        # batch 16 above stays as the reference-parity row (train.py:81-102).
        if not no_bf16:
            try:
                _, t_t, _, fl_t = bench_train(batch=128, precision="bf16", iters=3)
                _, t_o, _, _ = bench_train(batch=128, precision="bf16", iters=3,
                                           out_size=256)
                train_tuned = {
                    "batch": 128, "k": 8, "precision": "bf16",
                    "step_ms": round(t_t, 2),
                    "mfu": None if not fl_t else round(
                        _mfu(fl_t, t_t / 1e3), 4),
                    "samples_per_s": round(128 / (t_t / 1e3), 1),
                    "out_size256_step_ms": round(t_o, 2),
                    "out_size256_samples_per_s": round(128 / (t_o / 1e3), 1),
                }
            except Exception as e:
                print(f"tuned train bench skipped: {e}", file=sys.stderr)

    # MAS at both large reference shapes (test_monotonic_align_speed.py:126-130);
    # the largest remains the summary row
    mas_shapes = {}
    mas_speedup = mas_pallas_ms = mas_cpp_ms = mas_equal = None
    try:
        for (b, tx_, ty_) in ((16, 100, 500), (32, 150, 800)):
            sp, p_ms, c_ms, eq = bench_mas(b, tx_, ty_)
            mas_shapes[f"{b}x{tx_}x{ty_}"] = {
                "pallas_ms": round(p_ms, 2), "cpp_ms": round(c_ms, 2),
                "speedup": round(sp, 2), "paths_equal": eq,
            }
        mas_speedup, mas_pallas_ms, mas_cpp_ms, mas_equal = sp, p_ms, c_ms, all(
            v["paths_equal"] for v in mas_shapes.values()
        )
    except Exception as e:  # C++ toolchain missing etc.
        print(f"mas bench skipped: {e}", file=sys.stderr)
    mas_fused_equal = None
    try:
        mas_fused_equal = mas_fused_check()
    except Exception as e:
        print(f"mas fused check skipped: {e}", file=sys.stderr)

    result = {
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 1.0, 2),
        "backend": backend,
        "precision": precision,
        "batch": batch,
        "ode_steps": 10,
        "wall_s_per_batch": round(wall, 4),
        "audio_s_per_batch": round(audio_s, 2),
        "mfu": None if mfu is None else round(mfu, 4),
        "fp32_x_realtime": round(fp32_xrt, 1),
        "fp32_mfu": None if fp32_mfu is None else round(fp32_mfu, 4),
        "ode_sweep_x_realtime": ode_sweep,
        "single_sentence": single,
        "serve_latency_ms": serve_latency,
        "serve_throughput_tuned": serve_throughput,
        "serve_zero_sync": serve_zero_sync,
        "mas_pallas_ms": None if mas_pallas_ms is None else round(mas_pallas_ms, 2),
        "mas_cpp_ms": None if mas_cpp_ms is None else round(mas_cpp_ms, 2),
        "mas_pallas_vs_cpp_speedup": None if mas_speedup is None else round(mas_speedup, 2),
        "mas_shapes": mas_shapes,
        "mas_paths_equal": mas_equal,
        "mas_fused_paths_equal": mas_fused_equal,
        "omp_num_threads": int(os.environ["OMP_NUM_THREADS"]),
        "train_step_ms": None if train_ms is None else round(train_ms, 2),
        "train_step_ms_scan_dispatch": None if train_scan_ms is None
        else round(train_scan_ms, 2),
        "train_step_ms_scan_bf16": None if train_scan_bf16_ms is None
        else round(train_scan_bf16_ms, 2),
        "train_scan_dispatch_k": scan_k,
        "train_mfu": None if train_mfu is None else round(train_mfu, 4),
        "train_mfu_bf16": None if train_mfu_bf16 is None else round(train_mfu_bf16, 4),
        "train_tuned": train_tuned,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if "--train-sweep" in sys.argv:
        train_sweep()
    else:
        main()
