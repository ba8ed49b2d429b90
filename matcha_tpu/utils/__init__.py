"""Shared utilities: plotting, wav IO."""

import numpy as np

from matcha_tpu.utils.plotting import plot_tensor, save_mel_png


def save_wav(path, waveform, sample_rate: int = 22050):
    """Save a waveform as 16-bit PCM. Accepts float in [-1, 1] or int16 samples
    (the serving engine's `output_dtype="int16"` mode is already PCM16)."""
    from scipy.io import wavfile

    wav = np.asarray(waveform)
    if wav.ndim == 2:
        wav = wav[0]
    if wav.dtype != np.int16:
        wav = (np.clip(wav, -1.0, 1.0) * 32767).astype(np.int16)
    wavfile.write(path, sample_rate, wav)


__all__ = ["plot_tensor", "save_mel_png", "save_wav"]
