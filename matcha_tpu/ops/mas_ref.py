"""Monotonic Alignment Search — pure-JAX reference implementation.

Vectorized `lax.scan` formulation of the banded Viterbi DP the reference implements in
Cython (`/root/reference/matcha/utils/monotonic_align/core.pyx:16-96`): forward pass over
mel frames with a per-frame band `x in [max(0, tx+y-ty), min(tx, y+1))`, recording
take-diagonal bits, then a reverse scan that walks the best path back.

This version is the semantic oracle for the Pallas kernel and runs on any backend; it is
O(Ty) sequential steps of (B, Tx) vector work — the same schedule the Pallas kernel uses,
but staged through XLA ops instead of a fused kernel.
"""


import jax
import jax.numpy as jnp
from jax import lax

NEG = -1e9


def _mas_single(score, t_x, t_y):
    """DP for one utterance. score: (Tx, Ty); returns (Tx, Ty) 0/1 path."""
    tx_max, ty_max = score.shape
    xs = jnp.arange(tx_max, dtype=jnp.int32)

    def forward(dp_prev, y):
        x_min = jnp.maximum(0, t_x + y - t_y)
        x_max = jnp.minimum(t_x, y + 1)
        in_band = (xs >= x_min) & (xs < x_max)
        shifted = jnp.concatenate([jnp.full((1,), NEG, score.dtype), dp_prev[:-1]])
        from_prev = jnp.where(xs == 0, jnp.where(y == 0, 0.0, NEG), shifted)
        from_same = jnp.where((xs == y) | (y == 0), NEG, dp_prev)
        take_diag = (from_prev >= from_same) | (xs == y)
        best = jnp.where(take_diag, from_prev, from_same)
        dp_cur = jnp.where(in_band, best + score[:, y], NEG)
        return dp_cur, take_diag

    dp0 = jnp.full((tx_max,), NEG, score.dtype)
    _, take_diag = lax.scan(forward, dp0, jnp.arange(ty_max, dtype=jnp.int32))
    # take_diag: (Ty, Tx)

    def backward(idx, y):
        active = y < t_y
        row = (xs == idx) & active
        td_at_idx = jnp.sum(jnp.where(xs == idx, take_diag[y], False))
        dec = active & (y > 0) & (idx > 0) & ((idx == y) | td_at_idx)
        return idx - dec.astype(idx.dtype), row

    _, rows = lax.scan(
        backward, t_x - 1, jnp.arange(ty_max, dtype=jnp.int32), reverse=True
    )
    return rows.T.astype(score.dtype)  # (Tx, Ty)


@jax.jit
def maximum_path_ref(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Batch MAS, reference semantics (`monotonic_align/__init__.py:40`).

    Args:
        value: (B, Tx, Ty) alignment scores (log-prior).
        mask: (B, Tx, Ty) attention mask (x_mask ⊗ y_mask).
    Returns:
        (B, Tx, Ty) 0/1 monotone path, dtype of `value`.
    """
    value = value * mask
    t_x = mask[:, :, 0].sum(axis=1).astype(jnp.int32)
    t_y = mask[:, 0, :].sum(axis=1).astype(jnp.int32)
    path = jax.vmap(_mas_single)(value.astype(jnp.float32), t_x, t_y)
    return path.astype(value.dtype)
