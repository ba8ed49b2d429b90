"""Inference CLI: text -> mel -> waveform (Griffin-Lim or HiFi-GAN).

Counterpart of `/root/reference/generate.py` (Griffin-Lim path) and
`/root/reference/generate_HifiGan.py` (HiFi-GAN path): loads a trained checkpoint (or a
converted torch checkpoint via matcha_tpu.compat), tokenizes with the simplified
tokenizer (matching the reference inference scripts), synthesises a mel with the CFM
Euler sampler, and reconstructs audio.

Usage:
    python -m matcha_tpu.cli.generate --text "Hello" [--vocoder griffin_lim|hifigan]
        [--ckpt-dir checkpoints] [--torch-ckpt matcha_final.ckpt]
        [--hifigan-ckpt generator_v1 | --vocoder-ckpt-dir checkpoints_vocoder]
        [--steps 50] [--out-dir generated_audio]
"""

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TEXT = "Hello, I am your Matcha Text to Speech model, what can I do for you."


def load_params(args, model):
    """Load model params from an Orbax store or a converted torch checkpoint."""
    from matcha_tpu.models.matcha import init_params

    params = init_params(model, jax.random.PRNGKey(0))
    if args.torch_ckpt:
        from matcha_tpu.compat.torch_import import load_matcha_torch_checkpoint

        return load_matcha_torch_checkpoint(args.torch_ckpt, params)
    from matcha_tpu.train.checkpoints import CheckpointStore

    try:
        return CheckpointStore(args.ckpt_dir).restore_params()
    except FileNotFoundError as e:
        raise FileNotFoundError(f"{e}; train first or pass --torch-ckpt") from None


def main():
    from matcha_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="Matcha-TTS synthesis (TPU-native)")
    ap.add_argument("--text", default=DEFAULT_TEXT)
    ap.add_argument("--vocoder", default="griffin_lim", choices=["griffin_lim", "hifigan"])
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--torch-ckpt", default=None)
    ap.add_argument("--hifigan-ckpt", default=None,
                    help="torch generator_v1 checkpoint for the hifigan vocoder")
    ap.add_argument("--vocoder-ckpt-dir", default=None,
                    help="Orbax checkpoint dir from train_vocoder (weight norm is "
                         "folded for serving)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--length-scale", type=float, default=1.0)
    ap.add_argument("--out-dir", default="generated_audio")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from matcha_tpu.audio.mel import MelConfig
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS
    from matcha_tpu.ops.masks import fix_len_compatibility
    from matcha_tpu.text import simple_text_to_sequence
    from matcha_tpu.utils import save_mel_png, save_wav

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    model = MatchaTTS(MatchaConfig())
    params = load_params(args, model)

    # Tokenize with the simplified tokenizer — matches `generate.py:48`.
    seq = simple_text_to_sequence(args.text)
    x = jnp.asarray([seq], jnp.int32)
    xl = jnp.asarray([len(seq)], jnp.int32)

    t0 = time.perf_counter()
    # Stage 1: durations (host reads total frames to pick the static budget).
    mu_x, w_ceil, x_mask, y_lengths = model.apply(
        {"params": params}, x, xl, args.length_scale, method=MatchaTTS.encode_durations
    )
    budget = fix_len_compatibility(int(np.asarray(y_lengths).max()))
    # Stage 2: alignment + ODE decode at the static budget.
    out = model.apply(
        {"params": params}, mu_x, w_ceil, x_mask, y_lengths, budget, args.steps,
        args.temperature, method=MatchaTTS.decode_fixed,
        rngs={"noise": jax.random.PRNGKey(args.seed)},
    )
    mel = np.asarray(out["mel"])  # (1, T, 80)
    n_frames = int(out["mel_lengths"][0])
    mel = mel[:, :n_frames, :]
    wall = time.perf_counter() - t0
    from matcha_tpu.utils.profiling import rtf as compute_rtf

    rtf = compute_rtf(wall, n_frames)
    print(f"mel: {mel.shape}, rtf={rtf:.3f}")

    log_mel_cf = jnp.asarray(mel.transpose(0, 2, 1))  # (1, 80, T) channels-first
    cfg = MelConfig()
    if args.vocoder == "griffin_lim":
        from matcha_tpu.audio.griffin_lim import mel_to_audio

        wav = np.asarray(mel_to_audio(cfg, log_mel_cf, rng=jax.random.PRNGKey(args.seed)))
    else:
        from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

        gen = Generator(HiFiGANConfig())
        if args.hifigan_ckpt:
            from matcha_tpu.compat.torch_import import load_hifigan_torch_checkpoint

            gparams = load_hifigan_torch_checkpoint(args.hifigan_ckpt)
        elif args.vocoder_ckpt_dir:
            from matcha_tpu.train.vocoder import load_generator_for_inference

            gparams = load_generator_for_inference(args.vocoder_ckpt_dir)
        else:
            raise SystemExit(
                "the hifigan vocoder needs --hifigan-ckpt (torch generator_v1) or "
                "--vocoder-ckpt-dir (a train_vocoder checkpoint)"
            )
        wav = np.asarray(gen.apply({"params": gparams}, jnp.asarray(mel)))
        wav = np.clip(wav, -1.0, 1.0)

    wav_path = out_dir / f"matcha_{args.vocoder}.wav"
    save_wav(wav_path, wav, cfg.sample_rate)
    save_mel_png(mel[0].T, out_dir / "mel_spectrogram.png")
    print(f"saved {wav_path}")


if __name__ == "__main__":
    main()
