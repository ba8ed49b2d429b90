"""Inverse-mel + Griffin-Lim waveform reconstruction in JAX.

TPU-native counterpart of the reference Griffin-Lim path
(`/root/reference/generate.py:73-109`): torchaudio InverseMelScale (80 -> 513 linear
bins) followed by GriffinLim (n_fft 1024, 32 iterations, hop 256, power 1.0).

  * Inverse mel: non-negative least squares via projected Landweber iterations on the
    precomputed filterbank (torchaudio solves the same least-squares problem); a few
    hundred matmul iterations, all MXU work under one jit.
  * Griffin-Lim: classic phase-retrieval loop with momentum (torchaudio default 0.99)
    expressed as a `lax.scan` over ISTFT -> STFT round trips.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.audio.mel import MelConfig, _hann_window, _mel_basis, frame_signal


def _stft(cfg: MelConfig, y: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, F, frames) complex STFT, center=True (torchaudio GriffinLim)."""
    pad = cfg.n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(y, cfg.n_fft, cfg.hop_size)
    window = jnp.asarray(_hann_window(cfg.win_size))
    spec = jnp.fft.rfft(frames * window, n=cfg.n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def _istft(cfg: MelConfig, spec: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """(B, F, frames) complex -> (B, num_samples) via windowed overlap-add."""
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=cfg.n_fft, axis=-1)
    window = jnp.asarray(_hann_window(cfg.win_size))
    frames = frames * window

    b, n_frames, n_fft = frames.shape
    hop = cfg.hop_size
    total = (n_frames - 1) * hop + n_fft

    # Overlap-add via the transpose of the framing operator: scatter each frame at
    # offset i*hop. Expressed densely as k = n_fft/hop shifted block reshapes (the
    # exact adjoint of `frame_signal`), no scatter op needed.
    k = n_fft // hop
    acc = jnp.zeros((b, n_frames + k - 1, hop), frames.dtype)
    wacc = jnp.zeros((n_frames + k - 1, hop), jnp.float32)
    wsq = (window * window).reshape(k, hop)
    fr = frames.reshape(b, n_frames, k, hop)
    for j in range(k):
        acc = acc.at[:, j : j + n_frames, :].add(fr[:, :, j, :])
        wacc = wacc.at[j : j + n_frames, :].add(wsq[j][None, :])
    y = acc.reshape(b, total)
    wsum = wacc.reshape(total)
    y = y / jnp.maximum(wsum, 1e-11)
    start = cfg.n_fft // 2
    return jax.lax.dynamic_slice_in_dim(y, start, num_samples, axis=1)


@functools.partial(jax.jit, static_argnums=(0, 2))
def inverse_mel(cfg: MelConfig, mel: jnp.ndarray, n_iter: int = 200) -> jnp.ndarray:
    """(B, n_mels, T) linear-power mel -> (B, n_freq, T) non-negative linear spectrogram.

    Projected Landweber / NNLS: minimize ||M s - mel||^2 s.t. s >= 0.
    """
    basis = jnp.asarray(_mel_basis(cfg))  # (n_mels, n_freq)
    step = 1.0 / jnp.linalg.norm(basis, ord=2) ** 2
    # Init from the pseudo-inverse-ish transpose projection
    s0 = jnp.maximum(jnp.einsum("mf,bmt->bft", basis, mel), 0.0)

    def body(s, _):
        resid = jnp.einsum("mf,bft->bmt", basis, s) - mel
        grad = jnp.einsum("mf,bmt->bft", basis, resid)
        s = jnp.maximum(s - step * grad, 0.0)
        return s, None

    s, _ = jax.lax.scan(body, s0, None, length=n_iter)
    return s


@functools.partial(jax.jit, static_argnums=(0, 2, 5))
def griffin_lim(
    cfg: MelConfig,
    magnitude: jnp.ndarray,
    n_iter: int = 32,
    momentum: float = 0.99,
    rng: jax.Array | None = None,
    length: int | None = None,
) -> jnp.ndarray:
    """(B, n_freq, T) magnitude -> (B, samples) waveform via Griffin-Lim.

    torchaudio-default semantics: momentum 0.99, random phase init, 32 iterations.
    """
    b, _, t = magnitude.shape
    num_samples = length if length is not None else t * cfg.hop_size
    if rng is None:
        rng = jax.random.PRNGKey(0)
    phase = jax.random.uniform(rng, magnitude.shape, minval=-np.pi, maxval=np.pi)
    spec = magnitude * jnp.exp(1j * phase.astype(jnp.float32))

    mom = momentum / (1 + momentum)

    def body(carry, _):
        spec, prev_rebuilt = carry
        y = _istft(cfg, spec, num_samples)
        rebuilt = _stft(cfg, y)[:, :, :t]
        update = rebuilt - mom * prev_rebuilt
        angle = update / jnp.maximum(jnp.abs(update), 1e-16)
        return (magnitude * angle, rebuilt), None

    (spec, _), _ = jax.lax.scan(
        body, (spec, jnp.zeros_like(spec)), None, length=n_iter
    )
    return _istft(cfg, spec, num_samples)


def mel_to_audio(
    cfg: MelConfig,
    log_mel: jnp.ndarray,
    n_iter: int = 32,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Full reference Griffin-Lim path: log-mel -> exp -> inverse mel -> Griffin-Lim.

    Mirrors `generate.py:100-109` (exp applied when the mel is in log space).
    """
    mel = jnp.exp(log_mel)
    linear = inverse_mel(cfg, mel)
    return griffin_lim(cfg, linear, n_iter=n_iter, rng=rng)
