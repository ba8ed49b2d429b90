"""Shared utilities: plotting, wav IO."""

import numpy as np

from matcha_tpu.utils.plotting import plot_tensor, save_mel_png


def save_wav(path, waveform, sample_rate: int = 22050):
    """Save a float waveform in [-1, 1] as 16-bit PCM."""
    from scipy.io import wavfile

    wav = np.asarray(waveform)
    if wav.ndim == 2:
        wav = wav[0]
    wav = np.clip(wav, -1.0, 1.0)
    wavfile.write(path, sample_rate, (wav * 32767).astype(np.int16))


__all__ = ["plot_tensor", "save_mel_png", "save_wav"]
