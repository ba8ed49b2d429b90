"""Fused HiFi-GAN MRF dilation-step as a Pallas TPU kernel.

The generator's multi-receptive-field residual stacks are HBM-BANDWIDTH-bound,
not MXU-bound (measured trace, docs/DESIGN.md "Vocoder-graph op breakdown"):
after the 8x upsample stages every activation tensor holds ~2M elements per
batch row, and XLA executes one dilation step

    x <- x + conv_k1(lrelu(conv_kd(lrelu(x))))       (`hifi_gan/models.py:11-48`)

as ~5 separate full HBM traversals (lrelu, conv, lrelu, conv, add — the
elementwise ops cannot fuse INTO conv operands). This kernel computes the whole
dilation step in one VMEM-resident pass per (batch, time-tile) grid cell: HBM
traffic drops from ~5 read+write traversals to one read + one write (~2.5x),
which is the measured roofline of the block.

Layout: feature-last (B, T, C), flax conv kernels (k, C_in, C_out). Each conv
tap is one (T_tile, C) x (C, C) matmul with f32 accumulation on the MXU. Halo
frames come from the neighboring time tiles (three BlockSpec views of the same
array with shifted index maps — clamped at the edges and masked to zero by
absolute position, reproducing the convs' zero 'same' padding; note lrelu(0)=0
so masking before or after the first activation is equivalent).

Inference path only: training keeps the flax/XLA modules (weight-norm wraps).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1  # models/hifigan.py LRELU_SLOPE (kept local: ops must not
#                    import models; hifigan asserts the two stay equal)


def _lrelu(x):
    # compare in f32: Mosaic cannot lower bf16 vector comparisons
    # ("Target does not support this comparison")
    x = x.astype(jnp.float32)
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _mrf_kernel(xl_ref, xc_ref, xr_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *scratch, dilation: int, block_t: int, t_total: int, pack: bool):
    k = w1_ref.shape[0]
    h1 = dilation * (k - 1) // 2
    h2 = (k - 1) // 2
    H = h1 + h2
    i = pl.program_id(1)
    t0 = i * block_t
    prec = jax.lax.Precision.DEFAULT

    xc = xc_ref[0]  # (block_t, C)
    ext = jnp.concatenate(
        [xl_ref[0, block_t - H:], xc, xr_ref[0, :H]], axis=0
    )  # (block_t + 2H, C): tile plus halos from the neighbor tiles
    # zero frames whose ABSOLUTE position falls outside [0, T): edge tiles see
    # clamped (duplicated) neighbor blocks, and the convs' 'same' padding is zero
    pos = t0 - H + jax.lax.broadcasted_iota(jnp.int32, (block_t + 2 * H, 1), 0)
    valid = (pos >= 0) & (pos < t_total)
    y = _lrelu(jnp.where(valid, ext, 0)).astype(xc.dtype)

    c = (k - 1) // 2
    cin, cout = w1_ref.shape[1], w1_ref.shape[2]
    if pack:
        # im2col-in-VMEM tap packing (r4 follow-up): write the k shifted views
        # into lane-adjacent columns of a VMEM scratch and contract them in ONE
        # (T, k*C) x (k*C, C) matmul per conv. The narrow-channel stages
        # (C = 32/64 after the 8x upsamples) dominate the generator's time, and
        # their per-tap matmuls use only C of the MXU's 128 contraction lanes —
        # packing raises the contraction to k*C and cuts 2k matmul issues to 2
        # per dilation step. The scratch STORE is the canonicalization point:
        # Mosaic tracks roll/slice results as lazy sublane-offset layouts and
        # its lane-dim concatenate rejects mismatched offsets, but stores
        # relayout (measured: a concat of rolled taps fails to lower, the
        # scratch route compiles).
        p1_scr, p2_scr = scratch

        def tap(src, s, n):
            # window src[s : s+n] as a STATIC sublane slice (s+n <= len(src) by
            # the halo arithmetic); pltpu.roll is avoided — it lowers to
            # tpu.dynamic_rotate, unimplemented for these row counts
            return src[s : s + n]

        t1 = block_t + 2 * h2
        for j in range(k):
            p1_scr[:, j * cin:(j + 1) * cin] = tap(
                y, H - h2 + (j - c) * dilation, t1)
        acc1 = jax.lax.dot_general(
            p1_scr[...], w1_ref[...].reshape(k * cin, cout),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    else:
        # conv1 (dilated k taps) over [-h2, block_t + h2): one matmul per tap
        acc1 = jnp.zeros((block_t + 2 * h2, cout), jnp.float32)
        for j in range(k):
            o = (j - c) * dilation
            sl = y[H - h2 + o : H + h2 + o + block_t]
            acc1 = acc1 + jax.lax.dot_general(
                sl, w1_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
    z = _lrelu(acc1 + b1_ref[0].astype(jnp.float32))
    # conv2's zero padding at the sequence edges: z outside [0, T) must be 0
    # (it would otherwise hold lrelu(bias))
    zpos = t0 - h2 + jax.lax.broadcasted_iota(jnp.int32, (block_t + 2 * h2, 1), 0)
    z = jnp.where((zpos >= 0) & (zpos < t_total), z, 0).astype(xc.dtype)

    if pack:
        for j in range(k):
            p2_scr[:, j * cout:(j + 1) * cout] = tap(z, j, block_t)
        acc2 = jax.lax.dot_general(
            p2_scr[...], w2_ref[...].reshape(k * cout, cout),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    else:
        acc2 = jnp.zeros((block_t, cout), jnp.float32)
        for j in range(k):
            sl = z[j : j + block_t]  # offsets -h2..h2 relative to the output frame
            acc2 = acc2 + jax.lax.dot_general(
                sl, w2_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
    out = xc.astype(jnp.float32) + acc2 + b2_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _pick_block_t(t: int, max_block: int = 2048) -> int:
    # 2048 cap: at 4096 x 128 lanes the tile + f32 accumulators + Pallas's
    # double-buffered in/out blocks exceed the 16 MB VMEM budget (measured
    # 18.5 MB OOM at the k=7, C=128 stage). Packed (im2col) mode caps lower:
    # the (block_t, k*C) packed operand must also fit.
    for cand in (2048, 1024, 512, 256, 128, 64):
        if cand <= max_block and t % cand == 0:
            return min(cand, t)
    return 0  # no viable tiling — caller falls back to the XLA path


def _pack_mode(k: int, c: int, dtype) -> tuple:
    """(pack?, max_block): pack taps when channels underfill the MXU's 128
    contraction lanes, and bound the tile so the WHOLE kernel footprint —
    double-buffered in/out blocks, weights, f32 accumulators, and (in pack
    mode) the two im2col staging buffers — stays under ~14 MB of VMEM
    (measured OOM: 18.3 MB requested at k=7, C=256, f32, block 2048).

    Pack threshold 64 is MEASURED (full generator, bf16, batch 1): packing at
    C <= 64 gives 6.88 ms vs 7.20 ms with C <= 128 packing and 8.52 ms for
    XLA — at C = 128 the per-tap matmuls already fill the contraction lanes
    and the scratch staging only adds traffic."""
    pack = c <= 64
    bytes_per = jnp.dtype(dtype).itemsize

    def footprint(block):
        tiles = 4 * 2 * block * c * bytes_per      # 3 in + 1 out, double-buffered
        weights = 2 * (k * c * c + c) * bytes_per
        halo_ext = (block + 2 * 30) * c * 4        # lrelu'd ext tile (f32), worst H
        accs = 2 * (block + k) * c * 4             # acc1/z + acc2 in f32
        packed = 2 * block * k * c * bytes_per if pack else 0
        return tiles + weights + halo_ext + accs + packed

    max_block = 2048
    while footprint(max_block) > 14 * 2**20 and max_block > 64:
        max_block //= 2
    return pack, max_block


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def _fused_mrf(x, w1, b1, w2, b2, dilation: int, interpret: bool):
    b, t, c = x.shape
    k = w1.shape[0]
    pack, max_block = _pack_mode(k, c, x.dtype)
    block_t = _pick_block_t(t, max_block)
    h = dilation * (k - 1) // 2 + (k - 1) // 2
    assert block_t >= h, (block_t, h)
    n_tiles = t // block_t
    kern = functools.partial(_mrf_kernel, dilation=dilation, block_t=block_t,
                             t_total=t, pack=pack)
    xspec = lambda f: pl.BlockSpec((1, block_t, c), f)
    wspec = lambda arr: pl.BlockSpec(arr.shape, lambda bi, ti: (0,) * arr.ndim)
    h2 = (k - 1) // 2
    scratch = []
    if pack:  # im2col staging buffers (see _mrf_kernel pack branch)
        scratch = [pltpu.VMEM((block_t + 2 * h2, k * c), x.dtype),
                   pltpu.VMEM((block_t, k * c), x.dtype)]
    return pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            xspec(lambda bi, ti: (bi, jnp.maximum(ti - 1, 0), 0)),
            xspec(lambda bi, ti: (bi, ti, 0)),
            xspec(lambda bi, ti: (bi, jnp.minimum(ti + 1, n_tiles - 1), 0)),
            wspec(w1), wspec(b1), wspec(w2), wspec(b2),
        ],
        out_specs=xspec(lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, x, x, w1, b1, w2, b2)


def fused_mrf_step(x, w1, b1, w2, b2, dilation: int, interpret=None):
    """One MRF dilation step, VMEM-fused: x + conv_k1(lrelu(conv_kd(lrelu(x)))).

    Args:
        x: (B, T, C) activations (bf16 or f32).
        w1: (k, C, C) dilated-conv kernel (flax layout); b1: (C,) its bias.
        w2: (k, C, C) dilation-1 conv kernel; b2: (C,) its bias.
        dilation: conv1's dilation.
        interpret: force Pallas interpreter mode (defaults to True off-TPU).
    Returns:
        (B, T, C) in x's dtype, or None if T has no viable tiling (caller must
        fall back to the XLA path).
    """
    _, max_block = _pack_mode(w1.shape[0], x.shape[-1], x.dtype)
    if _pick_block_t(x.shape[1], max_block) == 0:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b1 = b1.reshape(1, -1)
    b2 = b2.reshape(1, -1)
    return _fused_mrf(x, w1, b1, w2, b2, int(dilation), bool(interpret))
