"""Text encoder stack (flax.linen, feature-last layout).

TPU-native reimplementation of the reference encoder
(`/root/reference/matcha/models/components/text_encoder.py`): scaled embedding ->
3-layer ConvReluNorm prenet (zero-init residual projection) -> 6-layer post-LN
transformer with conv-projected RoPE attention -> mean projection + duration predictor
on a stop-gradient of the encoding.

Layout: all activations are (B, T, C); masks are (B, T, 1). Conv1d(kernel 1) in the
reference becomes Dense; Conv1d(k) becomes feature-last `nn.Conv` — both map onto the
MXU. LayerNorm eps matches torch (1e-5).
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from matcha_tpu.nn.rope import apply_rope
from matcha_tpu.ops.masks import sequence_mask


@dataclass(frozen=True)
class EncoderConfig:
    """Canonical hyperparameters (`matcha_tts.py:123-138`)."""

    n_vocab: int = 150
    n_feats: int = 80
    n_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    prenet: bool = True
    filter_channels_dp: int = 256
    dp_kernel_size: int = 3
    dp_p_dropout: float = 0.1


def _kaiming_relu():
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class ConvReluNorm(nn.Module):
    """Conv prenet with residual zero-init projection (`text_encoder.py:17-57`)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 5
    num_layers: int = 3
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool):
        residual = x
        for _ in range(self.num_layers):
            x = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME")(x * mask)
            x = nn.LayerNorm(epsilon=1e-5)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        proj = nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )
        x = residual + proj(x)
        return x * mask


class DurationPredictor(nn.Module):
    """Two conv/LN blocks + linear head (`text_encoder.py:60-96`)."""

    filter_channels: int
    kernel_size: int = 3
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool):
        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME")(x * mask)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)

        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME")(x * mask)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)

        x = nn.Dense(1)(x * mask)
        return x * mask


class RoPEMultiHeadAttention(nn.Module):
    """Self-attention with RoPE on half of each head (`text_encoder.py:146-223`).

    The reference applies RoPE to the first `head_dim // 2` features of each head
    (`RotaryPositionalEmbeddings(head_dim * 0.5)`, `text_encoder.py:176-177`) and scales
    scores by 1/sqrt(head_dim). Padded keys are masked additively with -1e4.
    """

    channels: int
    num_heads: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, attn_mask, *, deterministic: bool):
        b, t, _ = x.shape
        head_dim = self.channels // self.num_heads
        xavier = nn.initializers.xavier_uniform()

        q = nn.Dense(self.channels, kernel_init=xavier, name="query")(x)
        k = nn.Dense(self.channels, kernel_init=xavier, name="key")(x)
        v = nn.Dense(self.channels, kernel_init=xavier, name="value")(x)

        def split_heads(a):
            return a.reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        rope_dim = int(head_dim * 0.5)
        q = apply_rope(q, rope_dim)
        k = apply_rope(k, rope_dim)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(head_dim).astype(x.dtype)
        # attn_mask: (B, 1, Tq, Tk); zeros -> -1e4 (reference masked_fill semantics)
        scores = jnp.where(attn_mask == 0, -1e4, scores)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout_rate, deterministic=deterministic)(probs)

        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.channels)
        return nn.Dense(self.channels, name="out")(out)


class ConvFFN(nn.Module):
    """Conv feed-forward with explicit masking (`text_encoder.py:235-253`)."""

    filter_channels: int
    out_channels: int
    kernel_size: int = 3
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool):
        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME")(x * mask)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x * mask


class TransformerEncoder(nn.Module):
    """Post-LN transformer encoder (`text_encoder.py:256-322`)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool):
        cfg = self.cfg
        # (B, T, 1) x (B, 1, T) -> (B, 1, T, T) broadcastable attention mask
        attn_mask = (mask[:, None, :, :] * mask[:, None, None, :, 0]).astype(x.dtype)
        drop = lambda a: nn.Dropout(cfg.p_dropout, deterministic=deterministic)(a)

        for _ in range(cfg.n_layers):
            x = x * mask
            attn = RoPEMultiHeadAttention(cfg.n_channels, cfg.n_heads, cfg.p_dropout)(
                x, attn_mask, deterministic=deterministic
            )
            x = nn.LayerNorm(epsilon=1e-5)(x + drop(attn))
            ffn = ConvFFN(cfg.filter_channels, cfg.n_channels, cfg.kernel_size, cfg.p_dropout)(
                x, mask, deterministic=deterministic
            )
            x = nn.LayerNorm(epsilon=1e-5)(x + drop(ffn))
        return x * mask


class TextEncoder(nn.Module):
    """Embedding -> prenet -> transformer -> (mu, log-durations) (`text_encoder.py:325-402`)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, text_ids, text_lengths, *, deterministic: bool = True):
        """
        Args:
            text_ids: (B, Tx) int token ids.
            text_lengths: (B,) int lengths.
        Returns:
            mu: (B, Tx, n_feats), logw: (B, Tx, 1), mask: (B, Tx, 1)
        """
        cfg = self.cfg
        emb = nn.Embed(
            cfg.n_vocab,
            cfg.n_channels,
            embedding_init=nn.initializers.normal(stddev=cfg.n_channels**-0.5),
        )(text_ids)
        x = emb * jnp.sqrt(cfg.n_channels).astype(emb.dtype)
        mask = sequence_mask(text_lengths, text_ids.shape[1]).astype(x.dtype)[:, :, None]

        if cfg.prenet:
            x = ConvReluNorm(cfg.n_channels, cfg.n_channels)(x, mask, deterministic=deterministic)

        x = TransformerEncoder(cfg)(x, mask, deterministic=deterministic)

        mu = nn.Dense(cfg.n_feats, name="mean_projection")(x) * mask

        # Duration predictor runs on a detached encoding (`text_encoder.py:399-400`).
        logw = DurationPredictor(
            cfg.filter_channels_dp, cfg.dp_kernel_size, cfg.dp_p_dropout
        )(jax.lax.stop_gradient(x), mask, deterministic=deterministic)

        return mu, logw, mask
