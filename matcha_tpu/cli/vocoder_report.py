"""Vocoder quality report: mel -> wav -> mel round-trip L1 for both vocoder paths.

Quantitative stand-in for the reference's golden-audio comparison
(`/root/reference/generated_audio_comparison/` — eyeball-only wav/png, and its
released checkpoints are unreachable offline): for a set of (synthetic or real)
waveforms, compute the log-mel, reconstruct audio with

  (a) Griffin-Lim + NNLS inverse mel (`/root/reference/generate.py:73-90` path) and
  (b) a TRAINED HiFi-GAN generator (the train->serve loop,
      `train.vocoder.load_generator_for_inference`),

re-extract the log-mel from each reconstruction, and report mean |mel - mel_rt|
per path. Lower is better; the HiFi-GAN number directly measures what vocoder
training bought over the signal-processing baseline on this data.

Usage:
    python -m matcha_tpu.cli.vocoder_report --synthetic \
        --vocoder-ckpt-dir checkpoints_vocoder --out artifacts/vocoder_roundtrip.json
"""

import argparse
import json

import jax.numpy as jnp
import numpy as np


def mel_l1(cfg, y_true: np.ndarray, y_rec: np.ndarray) -> float:
    """Mean |log-mel(y_true) - log-mel(y_rec)| over the common frame span."""
    from matcha_tpu.audio.mel import mel_spectrogram

    m_true = np.asarray(mel_spectrogram(cfg, jnp.asarray(y_true[None])))[0]
    m_rec = np.asarray(mel_spectrogram(cfg, jnp.asarray(y_rec[None])))[0]
    t = min(m_true.shape[1], m_rec.shape[1])
    return float(np.abs(m_true[:, :t] - m_rec[:, :t]).mean())


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--synthetic", action="store_true",
                    help="synthetic speech-shaped waveforms (no dataset needed)")
    ap.add_argument("--data", help="directory of wav files (e.g. LJSpeech wavs/)")
    ap.add_argument("--vocoder-ckpt-dir",
                    help="trained VocoderTrainer checkpoint dir (enables HiFi-GAN path)")
    ap.add_argument("--n", type=int, default=8, help="number of evaluation waveforms")
    ap.add_argument("--segment-size", type=int, default=32768,
                    help="samples per synthetic waveform (~1.5 s at 22.05 kHz)")
    ap.add_argument("--out", default="artifacts/vocoder_roundtrip.json")
    args = ap.parse_args(argv)

    import jax

    from matcha_tpu.audio.griffin_lim import mel_to_audio
    from matcha_tpu.audio.mel import MelConfig, mel_spectrogram
    from matcha_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = MelConfig()

    if args.synthetic:
        from matcha_tpu.data.audio_dataset import SyntheticWavDataset

        ds = SyntheticWavDataset(n_items=args.n, segment_size=args.segment_size, seed=1)
        wavs = [ds.get_segment(i, np.random.default_rng(0)) for i in range(args.n)]
    elif args.data:
        from pathlib import Path

        from matcha_tpu.audio.mel import load_wav

        paths = sorted(Path(args.data).glob("*.wav"))[: args.n]
        wavs = [load_wav(p)[0][: args.segment_size] for p in paths]
    else:
        ap.error("provide --data or --synthetic")

    gen = gparams = None
    if args.vocoder_ckpt_dir:
        from matcha_tpu.models.hifigan import Generator, HiFiGANConfig
        from matcha_tpu.train.vocoder import load_generator_for_inference

        gparams = load_generator_for_inference(args.vocoder_ckpt_dir)
        gen = Generator(HiFiGANConfig(), weight_norm=False)

    gl_fn = jax.jit(lambda lm, k: mel_to_audio(cfg, lm, rng=k))
    hg_fn = jax.jit(lambda lm: gen.apply({"params": gparams},
                                         jnp.swapaxes(lm, -1, -2))) if gen else None

    report = {"paths": {}, "n": len(wavs), "segment_size": args.segment_size,
              "source": "synthetic" if args.synthetic else args.data}
    gl_vals, hg_vals = [], []
    for i, y in enumerate(wavs):
        log_mel = mel_spectrogram(cfg, jnp.asarray(y[None]))  # (1, n_mels, T)
        y_gl = np.asarray(gl_fn(log_mel, jax.random.PRNGKey(i)))[0]
        gl_vals.append(mel_l1(cfg, y, y_gl))
        if hg_fn is not None:
            y_hg = np.clip(np.asarray(hg_fn(log_mel))[0], -1, 1)
            hg_vals.append(mel_l1(cfg, y, y_hg))

    report["paths"]["griffin_lim"] = {
        "mel_l1_mean": round(float(np.mean(gl_vals)), 4),
        "mel_l1_per_item": [round(v, 4) for v in gl_vals],
    }
    if hg_vals:
        report["paths"]["hifigan_trained"] = {
            "mel_l1_mean": round(float(np.mean(hg_vals)), 4),
            "mel_l1_per_item": [round(v, 4) for v in hg_vals],
            "ckpt_dir": args.vocoder_ckpt_dir,
        }

    from pathlib import Path

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["paths"]))


if __name__ == "__main__":
    main()
