"""Monotonic Alignment Search — Pallas TPU kernel.

TPU-native replacement for the reference's CPU Cython MAS
(`/root/reference/matcha/utils/monotonic_align/core.pyx`), which forces a
device->host->device round-trip every training step
(`monotonic_align/__init__.py:48-55`). Here the banded Viterbi DP runs entirely
on-chip:

  * The score tensor is laid out (Ty, B, Tx) so each DP step reads one (B, Tx) tile —
    batch in sublanes, text positions in lanes — a single VPU-shaped row per mel frame.
  * Kernel 1 (forward) runs a sequential grid over chunks of CHUNK mel frames; the DP
    row lives in VMEM scratch that persists across grid steps, an inner fori_loop walks
    the frames of the chunk, and take-diagonal bits stream back to HBM. Chunking
    amortizes the per-grid-step dispatch overhead ~CHUNK x while Pallas double-buffers
    the HBM streams.
  * Kernel 2 (backtrack) runs the chunk grid in reverse via the BlockSpec index map,
    carrying the per-utterance path position as a (B, 1) column; the gather
    `take_diag[y, b, idx_b]` is expressed as a one-hot reduction (no dynamic gather).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
CHUNK = 16  # mel frames per grid step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _forward_kernel(tx_ref, ty_ref, score_ref, td_ref, dp_ref):
    """One grid step = CHUNK mel frames of the DP over all utterances."""
    c = pl.program_id(0)
    chunk = score_ref.shape[0]

    @pl.when(c == 0)
    def _init():
        dp_ref[:] = jnp.full_like(dp_ref, NEG)

    b, tx_max = dp_ref.shape
    # lengths arrive LANE-TILED (B, 128) and are sliced to (B, 1) here: an
    # (N, 1) int32 custom-call operand takes a degenerate-dim relayout copy
    # that XLA:TPU was observed to miscompile in fused graphs (r4: in-graph
    # mask-sum lengths arrived as garbage -> collapsed alignment paths, while
    # the same kernel on entry-parameter operands was bit-correct)
    tx = tx_ref[:, :1]  # (B, 1) int32
    ty = ty_ref[:, :1]  # (B, 1) int32
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, tx_max), 1)

    def frame(j, dp_prev):
        # dp is LOOP-CARRIED (registers across the unrolled chunk) rather than
        # round-tripped through the VMEM scratch every frame — the r5 squeeze:
        # one scratch read + one write per CHUNK frames instead of one per frame.
        y = c * chunk + j
        x_min = jnp.maximum(0, tx + y - ty)
        x_max = jnp.minimum(tx, y + 1)
        in_band = (xs >= x_min) & (xs < x_max)

        # from_prev[x] = dp_prev[x-1]; x == 0 gets 0 at y == 0 else NEG.
        shifted = pltpu.roll(dp_prev, 1, 1)
        from_prev = jnp.where(xs == 0, jnp.where(y == 0, 0.0, NEG), shifted)
        from_same = jnp.where((xs == y) | (y == 0), NEG, dp_prev)

        take_diag = (from_prev >= from_same) | (xs == y)
        best = jnp.where(take_diag, from_prev, from_same)
        td_ref[j] = take_diag.astype(jnp.float32)
        return jnp.where(in_band, best + score_ref[j], NEG)

    dp_ref[:] = jax.lax.fori_loop(0, chunk, frame, dp_ref[:], unroll=True)


def _backward_kernel(tx_ref, ty_ref, td_ref, out_ref, idx_ref):
    """One grid step = CHUNK mel frames, visited in reverse (via the index map)."""
    s = pl.program_id(0)
    n_chunks = pl.num_programs(0)
    chunk = td_ref.shape[0]
    c = n_chunks - 1 - s

    tx = tx_ref[:, :1]  # lane-tiled operands, see _forward_kernel
    ty = ty_ref[:, :1]

    @pl.when(s == 0)
    def _init():
        idx_ref[:] = tx - 1

    b = idx_ref.shape[0]
    tx_max = out_ref.shape[2]
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, tx_max), 1)

    def frame(jj, idx):
        # idx loop-carried in registers, like the forward DP row
        j = chunk - 1 - jj
        y = c * chunk + j
        active = y < ty  # (B, 1) bool
        onehot = xs == idx  # (B, Tx)
        row = onehot & active
        td_at_idx = jnp.sum(jnp.where(onehot, td_ref[j], 0.0), axis=1, keepdims=True)
        dec = active & (y > 0) & (idx > 0) & ((idx == y) | (td_at_idx > 0.5))
        out_ref[j] = row.astype(jnp.float32)
        return idx - dec.astype(jnp.int32)

    idx_ref[:] = jax.lax.fori_loop(0, chunk, frame, idx_ref[:], unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def _mas_pallas(score_t: jnp.ndarray, t_x: jnp.ndarray, t_y: jnp.ndarray, interpret=False,
                chunk: int = CHUNK):
    """score_t: (Ty, B, Tx) f32 (Ty a multiple of `chunk`); returns (Ty, B, Tx) path rows."""
    ty_max, b, tx_max = score_t.shape
    assert ty_max % chunk == 0
    n_chunks = ty_max // chunk
    # lane-tile the per-sample lengths to (B, 128): a degenerate (B, 1) int32
    # operand forces a relayout copy that miscompiles in fused graphs (see
    # _forward_kernel comment); a full-lane operand takes the plain path
    tx_col = jnp.broadcast_to(t_x.reshape(b, 1).astype(jnp.int32), (b, 128))
    ty_col = jnp.broadcast_to(t_y.reshape(b, 1).astype(jnp.int32), (b, 128))

    row_spec = pl.BlockSpec((chunk, b, tx_max), lambda c: (c, 0, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    take_diag = pl.pallas_call(
        _forward_kernel,
        grid=(n_chunks,),
        in_specs=[len_spec, len_spec, row_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((ty_max, b, tx_max), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, tx_max), jnp.float32)],
        interpret=interpret,
    )(tx_col, ty_col, score_t)

    rev_spec = pl.BlockSpec(
        (chunk, b, tx_max), lambda s, n=n_chunks: (n - 1 - s, 0, 0),
        memory_space=pltpu.VMEM,
    )
    path_rows = pl.pallas_call(
        _backward_kernel,
        grid=(n_chunks,),
        in_specs=[len_spec, len_spec, rev_spec],
        out_specs=rev_spec,
        out_shape=jax.ShapeDtypeStruct((ty_max, b, tx_max), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, 1), jnp.int32)],
        interpret=interpret,
    )(tx_col, ty_col, take_diag)
    return path_rows


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def maximum_path_pallas(value: jnp.ndarray, mask: jnp.ndarray, interpret=None,
                        t_x=None, t_y=None, chunk: int = CHUNK) -> jnp.ndarray:
    """Batch MAS with reference-wrapper semantics (`monotonic_align/__init__.py:40`).

    Args:
        value: (B, Tx, Ty) alignment scores.
        mask: (B, Tx, Ty) attention mask.
        interpret: force Pallas interpreter mode (defaults to True off-TPU).
        t_x, t_y: optional (B,) masked text/mel lengths. PASS THEM WHEN THE
            CALLER HAS THEM (compute_losses does): deriving t_y from the mask
            inside a large fused graph hit a measured XLA:TPU miscompile — the
            `mask[:, 0, :].sum(axis=1)` slice-of-middle-axis reduce came back
            off by exactly 64 per sample in a full-size batch-128 training
            graph (r4; every other reduction of the same mask was correct),
            which collapsed the DP band and produced invalid paths. The
            fallback derivation here reduces a full-axis max instead of a
            slice, which did not exhibit the bug, but explicit lengths bypass
            the pattern entirely (and skip two reductions).
    Returns:
        (B, Tx, Ty) 0/1 path, dtype of `value`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = value.dtype
    b, tx_max, ty_max = value.shape
    value = (value * mask).astype(jnp.float32)
    if t_x is None:
        t_x = jnp.max(mask, axis=2).sum(axis=1)
    if t_y is None:
        t_y = jnp.max(mask, axis=1).sum(axis=1)
    t_x = t_x.astype(jnp.int32)
    t_y = t_y.astype(jnp.int32)

    # Pad lanes (Tx) to 128, sublanes (B) to 8, frames (Ty) to the chunk size.
    # Padded frames have an empty DP band and inactive backtrack rows, so they are
    # inert (same mechanism that handles per-sample t_y < Ty).
    tx_pad = _round_up(max(tx_max, 1), 128)
    b_pad = _round_up(max(b, 1), 8)
    ty_pad = _round_up(max(ty_max, 1), chunk)
    score_t = jnp.transpose(value, (2, 0, 1))  # (Ty, B, Tx)
    score_t = jnp.pad(
        score_t, ((0, ty_pad - ty_max), (0, b_pad - b), (0, tx_pad - tx_max))
    )
    t_x = jnp.pad(t_x, (0, b_pad - b))
    t_y = jnp.pad(t_y, (0, b_pad - b))

    rows = _mas_pallas(score_t, t_x, t_y, interpret=interpret, chunk=chunk)
    path = jnp.transpose(rows, (1, 2, 0))[:b, :tx_max, :ty_max]  # (B, Tx, Ty)
    return (path * mask).astype(out_dtype)
