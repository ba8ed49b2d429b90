"""Log-mel spectrogram pipeline in JAX.

TPU-native reimplementation of the reference feature extractor
(`/root/reference/matcha/utils/audio_process.py:32-71`): reflect-pad by
(n_fft - hop) / 2, framed STFT (Hann, center=False), magnitude
sqrt(re^2 + im^2 + 1e-9), slaney mel projection, log-compression log(clamp(x, 1e-5)).

Design notes (TPU-first):
  * Framing is a gather-free strided reshape-by-slice; the FFT is XLA's batched rfft.
  * The mel projection is a single (n_mels, n_freq) x (n_freq, frames) matmul -> MXU.
  * Everything is jittable with static shapes; batches of padded wavs are handled by
    computing frame counts from sample lengths outside jit (`num_frames`).
"""

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.audio.filters import mel_filterbank

MAX_WAV_VALUE = 32768.0


@dataclass(frozen=True)
class MelConfig:
    """Feature-extraction hyperparameters (reference defaults: `ljspeechDataset.py:15-16`)."""

    n_fft: int = 1024
    n_mels: int = 80
    sample_rate: int = 22050
    hop_size: int = 256
    win_size: int = 1024
    fmin: float = 0.0
    fmax: float = 8000.0

    @property
    def pad_size(self) -> int:
        return (self.n_fft - self.hop_size) // 2


@functools.lru_cache(maxsize=8)
def _mel_basis(cfg: MelConfig) -> np.ndarray:
    return mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)


@functools.lru_cache(maxsize=8)
def _hann_window(win_size: int) -> np.ndarray:
    # Periodic Hann, matching torch.hann_window(win_size).
    n = np.arange(win_size)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)).astype(np.float32)


def num_frames(cfg: MelConfig, num_samples: int) -> int:
    """Frames produced for a waveform of `num_samples` samples (after reflect pad)."""
    padded = num_samples + 2 * cfg.pad_size
    return (padded - cfg.n_fft) // cfg.hop_size + 1


def frame_signal(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, frame_length) overlapping frames.

    Implemented as `hop`-strided slices stacked along a new axis — XLA lowers this to
    cheap copies; no gather needed.
    """
    t = y.shape[-1]
    n = (t - frame_length) // hop + 1
    # Strided framing: reshape into hop-sized blocks, then frame i is the
    # concatenation of blocks i..i+k-1. Op count is k = frame_length/hop (4 here),
    # independent of the number of frames — no gather.
    assert frame_length % hop == 0, "frame_length must be a multiple of hop"
    k = frame_length // hop
    base = y[..., : (n + k - 1) * hop]
    blocks = base.reshape(*y.shape[:-1], n + k - 1, hop)
    parts = [blocks[..., j : j + n, :] for j in range(k)]
    return jnp.concatenate(parts, axis=-1)


def stft_magnitude(cfg: MelConfig, y: jnp.ndarray) -> jnp.ndarray:
    """(B, T) waveform -> (B, n_freq, n_frames) STFT magnitude, reference-compatible."""
    pad = cfg.pad_size
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(y, cfg.n_fft, cfg.hop_size)
    window = jnp.asarray(_hann_window(cfg.win_size))
    spec = jnp.fft.rfft(frames * window, n=cfg.n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    return jnp.swapaxes(mag, -1, -2)


def log_compress(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """Dynamic-range compression log(clamp(x, clip_val)) (`audio_process.py:18-20`)."""
    return jnp.log(jnp.clip(x, min=clip_val))


@functools.partial(jax.jit, static_argnums=0)
def mel_spectrogram(cfg: MelConfig, y: jnp.ndarray) -> jnp.ndarray:
    """(B, T) float waveform in [-1, 1] -> (B, n_mels, n_frames) log-mel."""
    mag = stft_magnitude(cfg, y)
    basis = jnp.asarray(_mel_basis(cfg))
    # HIGHEST precision: the default matmul precision runs reduced-precision passes
    # (bf16 on MXU) — unacceptable for the op that defines training targets.
    mel = jnp.einsum("mf,...ft->...mt", basis, mag, precision=jax.lax.Precision.HIGHEST)
    return log_compress(mel)


def load_wav(path):
    """Read a wav file -> (float32 waveform in [-1, 1], sample_rate)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        y = data.astype(np.float32) / MAX_WAV_VALUE
    elif data.dtype == np.int32:
        y = data.astype(np.float32) / 2147483648.0
    else:
        y = data.astype(np.float32)
    return y, sr


def load_and_process_audio(path, cfg: MelConfig = MelConfig()):
    """Wav file -> (1, n_mels, n_frames) log-mel (mirrors `audio_process.py:75-82`)."""
    y, sr = load_wav(path)
    if sr != cfg.sample_rate:
        raise ValueError(f"expected sample rate {cfg.sample_rate}, got {sr}")
    return mel_spectrogram(cfg, y[None, :])
