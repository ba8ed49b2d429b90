"""Rotary positional embeddings.

Matches the reference's RoPE semantics (`/root/reference/matcha/models/components/
text_encoder.py:99-143`): rotation is applied to only the first `rope_dim` features of
each head (the reference passes `head_dim * 0.5`), with GPT-NeoX-style pairing
(feature i rotates with feature i + rope_dim/2); the remaining features pass through.

Implemented as a pure function over a (B, H, T, D) array with precomputed cos/sin tables
— no state, no cache: tables are constants folded by XLA under jit.
"""

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _rope_tables(seq_len: int, rope_dim: int, base: float = 10_000.0):
    half = rope_dim // 2
    theta = 1.0 / (base ** (np.arange(0, rope_dim, 2, dtype=np.float64) / rope_dim))
    pos = np.arange(seq_len, dtype=np.float64)
    angles = np.einsum("t,f->tf", pos, theta)  # (T, half)
    angles = np.concatenate([angles, angles], axis=1)  # (T, rope_dim)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def apply_rope(x: jnp.ndarray, rope_dim: int) -> jnp.ndarray:
    """Rotate the first `rope_dim` features of each head.

    Args:
        x: (B, H, T, D) query or key tensor.
        rope_dim: number of leading features to rotate (even).
    Returns:
        same shape with RoPE applied.
    """
    seq_len = x.shape[-2]
    cos, sin = _rope_tables(seq_len, rope_dim)
    # Join the activation dtype (tables are f32) so bf16 serving stays bf16 end-to-end.
    cos = jnp.asarray(cos, dtype=x.dtype)[None, None]  # (1, 1, T, rope_dim)
    sin = jnp.asarray(sin, dtype=x.dtype)[None, None]

    x_rope, x_pass = x[..., :rope_dim], x[..., rope_dim:]
    half = rope_dim // 2
    neg_half = jnp.concatenate([-x_rope[..., half:], x_rope[..., :half]], axis=-1)
    x_rope = x_rope * cos + neg_half * sin
    return jnp.concatenate([x_rope, x_pass], axis=-1)
