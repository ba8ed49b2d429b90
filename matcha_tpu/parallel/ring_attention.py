"""Ring (blockwise) self-attention over a sequence-parallel mesh axis.

The greenfield sequence/context-parallel component from SURVEY.md §2.2: the reference
computes dense O(T^2) attention on one device (`decoder.py:300-304`,
`text_encoder.py:210`); for batched long-utterance inference the decoder's
self-attention can instead shard mel-time across a `seq` mesh axis. Each device keeps
its local Q block and streams K/V blocks around the ring with `lax.ppermute` over ICI,
accumulating the softmax online (flash-attention style running max / normalizer), so
no device ever materializes the full (T, T) score matrix or the gathered K/V.

Preserves the decoder's diffusers mask quirk: `bias` is the raw 0/1 key mask ADDED to
the scaled logits (see matcha_tpu/nn/transformer.py), rotated alongside K/V.

Use inside `jax.shard_map` with q/k/v/bias sharded over `axis_name` on their
sequence dimension; `ring_attention_reference` is the numerically identical
single-device oracle used by tests.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _online_block_update(q, k_blk, v_blk, bias_blk, m, l, o, scale):
    """One flash-style accumulation step for a single K/V block.

    q: (B, H, Tq, D); k_blk/v_blk: (B, H, Tk, D); bias_blk: (B, Tk) additive bias.
    m: (B, H, Tq) running max; l: (B, H, Tq) running normalizer; o: (B, H, Tq, D).
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k_blk) * scale
    s = s + bias_blk[:, None, None, :].astype(s.dtype)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    # exp(-inf - -inf) guards are unnecessary: bias is 0/1, never -inf.
    correction = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new[..., None])
    l_new = l * correction + jnp.sum(p, axis=-1)
    o_new = o * correction[..., None] + jnp.einsum("bhqk,bhkd->bhqd", p, v_blk)
    return m_new, l_new, o_new


def ring_attention(q, k, v, bias, axis_name: str, scale=None):
    """Blockwise self-attention with K/V rotating over `axis_name`.

    Args (per-device local shards, inside shard_map):
        q, k, v: (B, H, T_local, D).
        bias: (B, T_local) additive attention bias for the local keys.
        axis_name: mesh axis the sequence dimension is sharded over.
    Returns:
        (B, H, T_local, D) attention output for the local queries.
    """
    n = lax.psum(1, axis_name)
    scale = (1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)) if scale is None else scale
    perm = [(i, (i + 1) % n) for i in range(n)]

    b, h, tq, d = q.shape
    acc_dtype = jnp.promote_types(q.dtype, jnp.float32)
    # pcast to 'varying': the accumulators are per-shard state (device-varying over
    # the ring axis); shard_map's varying-axis checker rejects invariant carries.
    vary = lambda a: lax.pcast(a, (axis_name,), to="varying")
    m0 = vary(jnp.full((b, h, tq), -jnp.inf, acc_dtype))
    l0 = vary(jnp.zeros((b, h, tq), acc_dtype))
    o0 = vary(jnp.zeros((b, h, tq, d), acc_dtype))

    def body(i, carry):
        k_blk, v_blk, bias_blk, m, l, o = carry
        m, l, o = _online_block_update(
            q.astype(acc_dtype), k_blk.astype(acc_dtype), v_blk.astype(acc_dtype),
            bias_blk, m, l, o, scale,
        )
        # Rotate K/V (+ bias) one hop around the ring. The final iteration's
        # rotation is redundant but kept unconditional (fori_loop bodies must be
        # uniform); it costs one extra ICI hop per call.
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        v_blk = lax.ppermute(v_blk, axis_name, perm)
        bias_blk = lax.ppermute(bias_blk, axis_name, perm)
        return k_blk, v_blk, bias_blk, m, l, o

    _, _, _, m, l, o = lax.fori_loop(0, n, body, (k, v, bias, m0, l0, o0))
    return (o / l[..., None]).astype(q.dtype)


def ring_attention_reference(q, k, v, bias, scale=None):
    """Single-device dense oracle with identical semantics (additive 0/1 bias)."""
    scale = (1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)) if scale is None else scale
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s = s + bias[:, None, None, :].astype(s.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def make_ring_self_attention(mesh, axis_name: str = "seq"):
    """shard_map-wrapped ring attention: global (B, H, T, D) arrays, T sharded.

    Returns a jittable fn(q, k, v, bias) -> out with T sharded over `axis_name`
    and batch/head dims replicated (combine with a 'data' axis by sharding B
    outside; shard_map only needs the sequence axis).
    """
    from jax.sharding import PartitionSpec as P

    spec_qkv = P(None, None, axis_name, None)
    spec_bias = P(None, axis_name)

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_bias),
        out_specs=spec_qkv,
    )
    def fn(q, k, v, bias):
        return ring_attention(q, k, v, bias, axis_name)

    return fn
