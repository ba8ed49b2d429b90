"""Fused (flash-style) attention Pallas kernel for the decoder transformer.

Motivation: on the serving hot path the XLA attention materializes the full
(B, H, T, T) score tensor through HBM (QK^T write, softmax read/write, AV read).
A captured device trace of the bf16 batch-128 serving graph (docs/DESIGN.md
"Profiling") shows that core costing ~30 ms of a ~122 ms dispatch. This kernel
computes scores -> bias add -> softmax -> AV entirely in VMEM, one (batch, head)
cell per grid step, writing only the (T, D) output back to HBM.

MEASURED OUTCOME (1x v5e, bf16, per attention call): at the default 512-frame
budget, parity — 2.96 ms vs XLA's 3.07 ms at (128,4,512,64); the matmuls are
MXU-starved (D=64 contraction = half the 128-lane systolic width) and XLA's own
fusion already keeps the softmax off HBM well enough. At the 1024-frame budget
the VMEM kernel pulls ahead ~6% (3.00 vs 3.19 ms at b=64, 3.23 vs 3.45 ms at
b=128) as the (T,T) score tensor outgrows what XLA keeps fused on-chip.
Shipped as the `attn_impl="pallas"` option (identical parameters, numerics
pinned to the XLA path in tests); default stays "xla" for reference parity.

Semantics match `nn/transformer.py::DiffusersAttention` exactly, including the
reference's diffusers quirk of adding the RAW (B, T) mask values to the logits
(`/root/reference/matcha/models/components/transformer.py:297-370` via diffusers
`Attention.prepare_attention_mask` + `baddbmm(beta=1)` — the 0/1 mask is an
additive bias, not a -inf fill). Softmax here accumulates in f32 (the XLA path
exponentiates in bf16); tests pin the two paths together at bf16 tolerance
(`tests/test_attention_pallas.py`).

VMEM budget per cell: (T, T) f32 scores (4 MB at the 1024-frame budget cap) +
three (T, D) operands — comfortably inside the ~16 MB/core VMEM.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # (T, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    # DEFAULT precision explicitly: the package pins jax_default_matmul_precision
    # to float32 for reference parity, but Mosaic cannot lower bf16 operands with
    # an fp32 contract precision ("Bad lhs type"); native bf16 multiply with the
    # f32 accumulator below is exactly the MXU path this kernel wants.
    prec = jax.lax.Precision.DEFAULT
    # scores in f32 on the MXU; never leaves VMEM
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ) * scale  # (Tq, Tk)
    s = s + bias_ref[0].astype(jnp.float32)  # (1, Tk) broadcasts over queries
    # row softmax, f32 accumulation
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused_attention(q, k, v, bias, scale: float, interpret: bool):
    b, h, t, d = q.shape
    kern = functools.partial(_attn_kernel, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0)),
            # (B, 1, T) so the trailing block dims (1, T) match the array dims
            # (Pallas TPU requires the last two block dims divisible by (8, 128)
            # or equal to the array's)
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dbias_ref, *, scale: float):
    """Fused attention backward for one (batch, head) cell, flash-style: no
    residual probabilities are read from HBM — the softmax is RECOMPUTED in VMEM
    from q/k/bias (one extra (T,T) matmul, trading MXU FLOPs for the HBM
    round-trip of a (B,H,T,T) tensor), then all four cotangents come out of four
    more on-chip matmuls. Math (p = softmax(q k^T * scale + bias)):

        dv = p^T do
        dp = do v^T
        ds = p * (dp - rowsum(dp * p))        # softmax VJP
        dq = scale * ds k ;  dk = scale * ds^T q ;  dbias = colsum over queries(ds)
    """
    q = q_ref[0, 0]  # (T, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    prec = jax.lax.Precision.DEFAULT  # see dtype note in _attn_kernel
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ) * scale
    s = s + bias_ref[0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (Tq, Tk) f32

    pc = p.astype(v.dtype)  # MXU operands in the activation dtype (fwd parity)
    dv = jax.lax.dot_general(  # p^T do: contract over queries
        pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    dp = jax.lax.dot_general(  # do v^T -> (Tq, Tk)
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # f32
    dsc = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        dsc, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ) * scale
    dk = jax.lax.dot_general(  # ds^T q: contract over queries
        dsc, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    dbias_ref[0, 0, 0] = jnp.sum(ds, axis=0).astype(dbias_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused_attention_bwd(q, k, v, bias, do, scale: float, interpret: bool):
    b, h, t, d = q.shape
    kern = functools.partial(_attn_bwd_kernel, scale=scale)
    qkv_spec = pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0))
    dq, dk, dv, dbias = pl.pallas_call(
        kern,
        grid=(b, h),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),
            qkv_spec,
        ],
        out_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            # (B, H, 1, T): trailing block dims (1, T) == array dims
            pl.BlockSpec((1, 1, 1, t), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, t, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, t, d), v.dtype),
            jax.ShapeDtypeStruct((b, h, 1, t), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias, do)
    # bias is broadcast over heads and query rows: fold the heads here
    return dq, dk, dv, jnp.sum(dbias[:, :, 0, :], axis=1)[:, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_core(q, k, v, bias3, scale: float, interpret: bool):
    return _fused_attention(q, k, v, bias3, scale, interpret)


def _attention_core_fwd(q, k, v, bias3, scale, interpret):
    out = _fused_attention(q, k, v, bias3, scale, interpret)
    return out, (q, k, v, bias3)  # flash-style: no (T,T) residual saved


def _attention_core_bwd(scale, interpret, res, do):
    q, k, v, bias3 = res
    dq, dk, dv, dbias = _fused_attention_bwd(q, k, v, bias3, do, scale, interpret)
    return dq, dk, dv, dbias.astype(bias3.dtype)


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


def fused_attention(q, k, v, bias=None, scale: float = 1.0, interpret=None):
    """softmax(q @ k^T * scale + bias[:, None, None, :]) @ v, fused in VMEM.

    Args:
        q, k, v: (B, H, T, D).
        bias: optional (B, T) additive logit bias (broadcast over heads and
            query positions — the diffusers key-mask layout).
        scale: logit scale (1/sqrt(D)).
        interpret: force Pallas interpreter mode (defaults to True off-TPU).
    Returns:
        (B, H, T, D) attention output in q's dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if bias is None:
        bias = jnp.zeros((q.shape[0], q.shape[2]), q.dtype)
    return _attention_core(q, k, v, bias[:, None, :], float(scale), interpret)
