"""Mel pipeline parity tests vs torch.stft (the backend the reference uses).

The reference's features (`audio_process.py`) are torch.stft + librosa slaney filters +
log-compression. Here we rebuild the same computation with torch primitives inside the
test as the oracle (no reference code imported) and require allclose.
"""

import numpy as np
import pytest
import torch

from matcha_tpu.audio.filters import mel_filterbank
from matcha_tpu.audio.mel import MelConfig, mel_spectrogram, num_frames, stft_magnitude

CFG = MelConfig()


def _torch_mel_oracle(y_np, cfg=CFG, dtype=torch.float64):
    """torch.stft-based oracle mirroring the reference feature pipeline semantics.

    Runs in float64 by default so the oracle itself carries no f32 rounding noise.
    """
    y = torch.from_numpy(y_np).to(dtype)
    pad = (cfg.n_fft - cfg.hop_size) // 2
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        y,
        cfg.n_fft,
        hop_length=cfg.hop_size,
        win_length=cfg.win_size,
        window=torch.hann_window(cfg.win_size, dtype=dtype),
        center=False,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    mag = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9)
    basis = torch.from_numpy(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    ).to(dtype)
    mel = torch.matmul(basis, mag)
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()


@pytest.fixture(scope="module")
def wav_batch():
    rng = np.random.default_rng(0)
    t = 22050  # 1 second
    # Mixture of tones + noise, realistic dynamic range
    time = np.arange(t) / 22050.0
    y = 0.3 * np.sin(2 * np.pi * 440 * time) + 0.1 * np.sin(2 * np.pi * 3211 * time)
    y = y + 0.02 * rng.standard_normal(t)
    y2 = 0.5 * rng.standard_normal(t) * np.hanning(t)
    return np.stack([y, y2]).astype(np.float32)


def test_stft_magnitude_matches_torch(wav_batch):
    ours = np.asarray(stft_magnitude(CFG, wav_batch))
    y = torch.from_numpy(wav_batch)
    pad = CFG.pad_size
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        y, CFG.n_fft, hop_length=CFG.hop_size, win_length=CFG.win_size,
        window=torch.hann_window(CFG.win_size), center=False, return_complex=True,
    )
    theirs = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)


def test_mel_filterbank_slaney_semantics():
    """Independent recomputation of the slaney filterbank formula as the oracle."""
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # Each filter is unimodal with a monotone peak progression
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)

    # Oracle: direct formula. Slaney scale: linear f/(200/3) below 1 kHz,
    # 15 + ln(f/1000)/ (ln(6.4)/27) above (librosa htk=False).
    def h2m(f):
        f = np.asarray(f, dtype=np.float64)
        return np.where(f < 1000.0, f / (200.0 / 3), 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0))

    def m2h(m):
        m = np.asarray(m, dtype=np.float64)
        return np.where(m < 15.0, m * 200.0 / 3, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)))

    mel_pts = m2h(np.linspace(h2m(0.0), h2m(8000.0), 82))
    freqs = np.arange(513) * 22050.0 / 1024
    oracle = np.zeros((80, 513))
    for m in range(80):
        lo, c, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (freqs - lo) / (c - lo)
        down = (hi - freqs) / (hi - c)
        tri = np.maximum(0.0, np.minimum(up, down))
        oracle[m] = tri * 2.0 / (hi - lo)
    np.testing.assert_allclose(fb, oracle.astype(np.float32), atol=1e-7)


def test_mel_spectrogram_end_to_end(wav_batch):
    ours = np.asarray(mel_spectrogram(CFG, wav_batch))
    oracle = _torch_mel_oracle(wav_batch)
    assert ours.shape == oracle.shape
    assert ours.shape[1] == 80
    # Tight bound where the signal has energy; log-domain noise at near-silent bins
    # (linear values near the 1e-5 clip) is pure f32 rounding and is bounded loosely.
    loud = oracle > np.log(1e-3)
    assert loud.mean() > 0.5
    np.testing.assert_allclose(ours[loud], oracle[loud], atol=1e-3)
    np.testing.assert_allclose(ours, oracle, atol=2e-2)


def test_num_frames(wav_batch):
    mel = mel_spectrogram(CFG, wav_batch)
    assert mel.shape[-1] == num_frames(CFG, wav_batch.shape[-1])
