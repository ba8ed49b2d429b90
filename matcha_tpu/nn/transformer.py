"""Decoder transformer block (flax.linen).

Reimplements the diffusers-path `BasicTransformerBlock` the reference decoder uses
(`/root/reference/matcha/models/components/transformer.py:193-370` with
activation_fn="gelu", no cross-attention, plain LayerNorm): pre-LN self-attention +
pre-LN feed-forward with residuals.

Attention-mask semantics (quirk, preserved deliberately): the reference passes the raw
0/1 float mask into diffusers' `Attention`, whose `get_attention_scores` ADDS it to the
scaled logits via baddbmm(beta=1) — i.e. valid keys get a +1 additive bias rather than
padding being masked to -inf. We reproduce that exact additive-bias behavior
(SURVEY.md §7: "follow the diffusers path, not the [mask-dropping] fallback").

Also provides SnakeBeta (`transformer.py:35-102`) and the GEGLU/GELU feed-forward
variants for configuration parity.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class SnakeBeta(nn.Module):
    """x + 1/beta * sin^2(alpha * x) with log-scale trainable alpha/beta (`transformer.py:35`)."""

    in_features: int
    out_features: int
    alpha_logscale: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_features)(x)
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.out_features,))
        beta = self.param("beta", init, (self.out_features,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        return x + (1.0 / (beta + 1e-9)) * jnp.sin(x * alpha) ** 2


class FeedForward(nn.Module):
    """Transformer FFN with selectable activation (`transformer.py:105-188`)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    activation_fn: str = "gelu"
    final_dropout: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        inner = self.dim * self.mult
        if self.activation_fn == "gelu":
            # diffusers GELU: Linear then exact gelu
            x = nn.Dense(inner)(x)
            x = jax.nn.gelu(x, approximate=False)
        elif self.activation_fn == "gelu-approximate":
            x = nn.Dense(inner)(x)
            x = jax.nn.gelu(x, approximate=True)
        elif self.activation_fn == "geglu":
            h = nn.Dense(inner * 2)(x)
            h, gate = jnp.split(h, 2, axis=-1)
            x = h * jax.nn.gelu(gate, approximate=False)
        elif self.activation_fn in ("snake", "snakebeta"):
            x = SnakeBeta(self.dim, inner)(x)
        else:
            raise ValueError(f"unknown activation_fn: {self.activation_fn}")
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.dim)(x)
        if self.final_dropout:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class DiffusersAttention(nn.Module):
    """diffusers-style multi-head attention with additive-bias mask handling.

    q/k/v projections have no bias (diffusers `Attention` default), output projection
    does; dropout sits after the output projection (diffusers `to_out` = [Linear,
    Dropout]).
    """

    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.0
    # "xla" einsum path (parity default) or the fused VMEM Pallas kernel
    # (ops/attention_pallas.py) — identical parameters, softmax accumulated in
    # f32 instead of bf16 (pinned together in tests/test_attention_pallas.py)
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, attn_bias: Optional[jnp.ndarray], *, deterministic: bool,
                 seq_axis: Optional[str] = None):
        b, t, _ = x.shape
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, name="to_v")(x)

        def split(a):
            return a.reshape(b, t, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scale = 1.0 / jnp.sqrt(self.dim_head).astype(x.dtype)

        out = None
        if seq_axis is not None:
            # Sequence/context parallelism: when the ambient mesh has a seq axis of
            # size > 1, compute attention blockwise with K/V ring-rotated over ICI
            # (matcha_tpu/parallel/ring_attention.py) instead of relying on the SPMD
            # partitioner's all-gather of the full K/V. Other mesh axes (data/model)
            # stay automatically partitioned (`axis_names={seq_axis}`).
            from matcha_tpu.parallel import current_mesh
            from matcha_tpu.parallel.ring_attention import ring_attention

            mesh = current_mesh()
            if mesh is not None and dict(mesh.shape).get(seq_axis, 1) > 1:
                import functools

                from jax.sharding import PartitionSpec as P

                bias = attn_bias if attn_bias is not None else jnp.zeros((b, t), x.dtype)
                out = jax.shard_map(
                    functools.partial(ring_attention, axis_name=seq_axis, scale=scale),
                    mesh=mesh,
                    in_specs=(P(None, None, seq_axis, None),) * 3 + (P(None, seq_axis),),
                    out_specs=P(None, None, seq_axis, None),
                    axis_names={seq_axis},
                )(q, k, v, bias)

        if out is None and self.attn_impl == "pallas":
            from matcha_tpu.ops.attention_pallas import fused_attention

            out = fused_attention(q, k, v, attn_bias, scale=float(1.0 / self.dim_head**0.5))
        if out is None:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
            if attn_bias is not None:
                # (B, Tk) 0/1 mask added to logits — the diffusers baddbmm(beta=1) quirk.
                scores = scores + attn_bias[:, None, None, :]
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class BasicTransformerBlock(nn.Module):
    """Pre-LN self-attention + FFN block (`transformer.py:193-370`, gelu config)."""

    dim: int
    num_attention_heads: int
    attention_head_dim: int
    dropout: float = 0.0
    activation_fn: str = "gelu"
    attn_impl: str = "xla"  # see DiffusersAttention.attn_impl

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic: bool = True,
                 seq_axis: Optional[str] = None):
        """
        Args:
            x: (B, T, C) hidden states.
            attention_mask: (B, T) 0/1 float mask (added to logits, see module doc).
            deterministic/seq_axis: positional-or-keyword (NOT keyword-only) so
                nn.remat can mark them static via static_argnums (decoder remat).
            seq_axis: optional mesh axis for ring attention over sharded T.
        """
        h = nn.LayerNorm(epsilon=1e-5)(x)
        x = x + DiffusersAttention(
            self.dim, self.num_attention_heads, self.attention_head_dim, self.dropout,
            attn_impl=self.attn_impl,
        )(h, attention_mask, deterministic=deterministic, seq_axis=seq_axis)

        h = nn.LayerNorm(epsilon=1e-5)(x)
        x = x + FeedForward(self.dim, dropout=self.dropout, activation_fn=self.activation_fn)(
            h, deterministic=deterministic
        )
        return x
