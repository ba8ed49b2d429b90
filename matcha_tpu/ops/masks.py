"""Mask and alignment-path utilities (JAX, static-shape, mask-first).

TPU-native equivalents of the reference tensor utilities
(`/root/reference/matcha/utils/model.py`): sequence masks, U-Net length rounding,
duration->alignment path construction, duration loss, and mel normalization.
All functions take static maximum lengths so they trace to fixed shapes under jit.
"""

import jax.numpy as jnp
import numpy as np


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_length) bool mask; True at valid positions.

    Mirrors `model.py:13` (create_sequence_mask) with a static `max_length`.
    """
    positions = jnp.arange(max_length, dtype=lengths.dtype)
    return positions[None, :] < lengths[:, None]


def fix_len_compatibility(length: int, num_downsamplings: int = 2) -> int:
    """Round `length` up to a multiple of 2**num_downsamplings (`model.py:37`).

    Host-side helper (python ints) used to choose static mel-frame paddings.
    """
    factor = 2 ** num_downsamplings
    return int(np.ceil(length / factor) * factor)


def generate_path(durations: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Durations -> 0/1 monotone alignment path.

    Args:
        durations: (B, Tx) per-token frame counts.
        mask: (B, Tx, Ty) attention mask.
    Returns:
        (B, Tx, Ty) path where row x covers frames [cum(x-1), cum(x)).

    Mirrors `model.py:77` (build_alignment_path): cumulative-duration mask minus its
    shift along the token axis.
    """
    b, t_x, t_y = mask.shape
    cum = jnp.cumsum(durations, axis=1)  # (B, Tx)
    frames = jnp.arange(t_y, dtype=cum.dtype)
    cum_mask = (frames[None, None, :] < cum[:, :, None]).astype(mask.dtype)
    path = cum_mask - jnp.pad(cum_mask, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
    return path * mask


def duration_loss(logw: jnp.ndarray, logw_target: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared log-duration error normalized by total token count (`model.py:117`)."""
    return jnp.sum((logw - logw_target) ** 2) / jnp.sum(lengths)


def normalize(data: jnp.ndarray, mean, std) -> jnp.ndarray:
    """(x - mean) / std with scalar or per-channel stats (`model.py:138`)."""
    mean = jnp.asarray(mean)
    std = jnp.asarray(std)
    if mean.ndim > 0:
        mean = mean[..., None]
    if std.ndim > 0:
        std = std[..., None]
    return (data - mean) / std


def denormalize(data: jnp.ndarray, mean, std) -> jnp.ndarray:
    """x * std + mean with scalar or per-channel stats (`model.py:180`)."""
    mean = jnp.asarray(mean)
    std = jnp.asarray(std)
    if mean.ndim > 0:
        mean = mean[..., None]
    if std.ndim > 0:
        std = std[..., None]
    return data * std + mean
