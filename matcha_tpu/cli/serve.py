"""Batched serving CLI on top of matcha_tpu.serve.TTSEngine.

Synthesizes a BATCH of texts in one device dispatch (vs cli/generate's one-sentence
flow), with optional bf16 serving and either vocoder.

Usage:
    python -m matcha_tpu.cli.serve --ckpt-dir checkpoints \
        --texts "First sentence." "Second sentence." [--vocoder hifigan
        --vocoder-ckpt-dir checkpoints_vocoder] [--bf16] [--out-dir served_audio]
"""

import argparse
from pathlib import Path


def main():
    from matcha_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="Batched Matcha-TTS serving")
    ap.add_argument("--texts", nargs="+", required=True)
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--torch-ckpt", default=None)
    ap.add_argument("--vocoder", default="griffin_lim", choices=["griffin_lim", "hifigan"])
    ap.add_argument("--vocoder-ckpt-dir", default=None)
    ap.add_argument("--hifigan-ckpt", default=None, help="torch generator_v1 ckpt")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--bf16", action="store_true", help="bf16 serving precision")
    ap.add_argument("--out-dir", default="served_audio")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--concurrent", action="store_true",
                    help="drive each text as a separate serve() request from its "
                         "own thread through the batching front-end (max-wait "
                         "batching, per-request seeds) instead of one synthesise "
                         "batch — exercises the production concurrent path")
    ap.add_argument("--low-latency", action="store_true",
                    help="synthesise each text through the one-dispatch fused "
                         "path (synthesise_lowlatency): fixed largest budget, no "
                         "host budget-pick round trip — minimum per-sentence "
                         "latency instead of maximum batch throughput")
    ap.add_argument("--int16", action="store_true",
                    help="device-side PCM16 waveforms (4x less device->host "
                         "traffic; what the output wav file stores anyway)")
    ap.add_argument("--mel-budgets", type=int, nargs="+", default=None,
                    help="static mel-frame budgets (default 128 256 512 1024). "
                         "A SINGLE budget enables the zero-sync dispatch "
                         "pipeline: no predicted-length host read per group — "
                         "the latency-optimal concurrent-serving deployment "
                         "(measured p50 70.8 ms vs 101 ms at 8 threads)")
    args = ap.parse_args()

    from matcha_tpu.cli.generate import load_params
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS
    from matcha_tpu.serve import ServeConfig, TTSEngine
    from matcha_tpu.utils import save_wav

    model = MatchaTTS(MatchaConfig())
    params = load_params(args, model)

    vocoder_params = None
    if args.vocoder == "hifigan":
        if args.hifigan_ckpt:
            from matcha_tpu.compat.torch_import import load_hifigan_torch_checkpoint

            vocoder_params = load_hifigan_torch_checkpoint(args.hifigan_ckpt)
        elif args.vocoder_ckpt_dir:
            from matcha_tpu.train.vocoder import load_generator_for_inference

            vocoder_params = load_generator_for_inference(args.vocoder_ckpt_dir)
        else:
            raise SystemExit("hifigan vocoder needs --hifigan-ckpt or --vocoder-ckpt-dir")

    engine = TTSEngine(
        params,
        cfg=ServeConfig(n_timesteps=args.steps, bf16=args.bf16, vocoder=args.vocoder,
                        max_batch=max(len(args.texts), 16),
                        output_dtype="int16" if args.int16 else "float32",
                        **({"mel_budgets": tuple(args.mel_budgets)}
                           if args.mel_budgets else {})),
        vocoder_params=vocoder_params,
    )
    if args.low_latency:
        wavs, infos = [], []
        for i, text in enumerate(args.texts):
            wav, inf = engine.synthesise_lowlatency(text, seed=args.seed + i)
            wavs.append(wav)
            infos.append(inf)
            print(f"low-latency: {inf['wall_s'] * 1e3:.1f} ms, "
                  f"budget={inf['budget']}, rtf={inf['rtf']:.4f}")
        info = {"budget": max(i["budget"] for i in infos),
                "wall_s": max(i["wall_s"] for i in infos),
                "rtf": sum(i["rtf"] for i in infos) / len(infos)}
    elif args.concurrent:
        import threading

        engine.start_batching()
        results = [None] * len(args.texts)
        errors = []

        def run(i):
            try:
                results[i] = engine.serve(args.texts[i], seed=args.seed + i)
            except Exception as e:  # surface the real error after join, not a
                errors.append((i, e))  # TypeError from the None placeholder

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(args.texts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        engine.stop_batching()
        if errors:
            i, e = errors[0]
            raise RuntimeError(f"serve() failed for text {i}: {e}") from e
        wavs = [w for w, _ in results]
        infos = [inf for _, inf in results]
        info = {"budget": max(i["budget"] for i in infos),
                "wall_s": max(i["wall_s"] for i in infos),
                "rtf": sum(i["rtf"] for i in infos) / len(infos)}
        print(f"concurrent: group sizes {[i['group_size'] for i in infos]}")
    else:
        wavs, info = engine.synthesise(args.texts, seed=args.seed)

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for i, wav in enumerate(wavs):
        path = out / f"utt_{i:03d}.wav"
        save_wav(path, wav, engine.cfg.mel_cfg.sample_rate)
        print(f"saved {path} ({wav.shape[0] / engine.cfg.mel_cfg.sample_rate:.2f} s)")
    print(f"batch of {len(wavs)}: budget={info['budget']} frames, "
          f"wall={info['wall_s']:.3f} s, rtf={info['rtf']:.4f}")


if __name__ == "__main__":
    main()
