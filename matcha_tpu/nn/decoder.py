"""CFM velocity-estimator U-Net (flax.linen, feature-last layout).

TPU-native reimplementation of the reference 1-D U-Net decoder
(`/root/reference/matcha/models/components/decoder.py`): sinusoidal time embedding ->
MLP, two down blocks (ResNet1D + transformer + stride-2 conv / k3 conv), two mid blocks,
two up blocks with skip concatenation and ConvTranspose / k3 conv, final
conv-GroupNorm-Mish-projection head.

Deliberately-preserved reference quirks (SURVEY.md §7):
  * downsampled masks are TRUNCATIONS of the previous mask (`decoder.py:311-316`), not
    pooled masks;
  * mask re-expansion on the up path uses nearest interpolation (`decoder.py:357-364`);
  * transformer blocks receive the raw 0/1 mask as an additive logit bias (see
    matcha_tpu/nn/transformer.py).

Mel lengths must be padded to a multiple of 2**num_downsamples (fix_len_compatibility)
so all internal shapes are static and strided convs invert exactly — this makes the
reference's `F.interpolate` skip-join mismatch branch (`decoder.py:338-339`)
unreachable, which we assert instead of emulating.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.nn.transformer import BasicTransformerBlock


@dataclass(frozen=True)
class DecoderConfig:
    """Canonical hyperparameters (`matcha_tts.py:146-153`)."""

    in_channels: int = 160  # 2 * n_feats (x ++ mu)
    out_channels: int = 80
    channels: Tuple[int, ...] = (256, 256)
    dropout: float = 0.05
    attention_head_dim: int = 64
    n_blocks: int = 1
    num_mid_blocks: int = 2
    num_heads: int = 4
    # "xla": einsum attention (reference-parity default); "pallas": fused VMEM
    # attention kernel (ops/attention_pallas.py) — the serving hot-path choice;
    # parameter trees are identical, so the flag can be flipped per deployment.
    # The Pallas kernel carries a custom_vjp fused backward, so "pallas" is
    # valid inside the training graph too.
    attn_impl: str = "xla"
    # Rematerialization of the U-Net blocks (training memory/HBM-traffic knob):
    # None = save all activations (XLA default); "full" = recompute everything
    # in the backward (nn.remat, nothing saved); "dots" = save only matmul
    # outputs (jax.checkpoint_policies.checkpoint_dots). Parameter trees are
    # identical across settings (nn.remat is name-transparent).
    remat: Optional[str] = None


def _kaiming_relu():
    # torch.nn.init.kaiming_normal_(nonlinearity="relu") == He-normal fan_in (`decoder.py:255-268`)
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class SinusoidalPosEmb(nn.Module):
    """Time t -> (B, dim) sinusoidal embedding with scale 1000 (`decoder.py:8-31`)."""

    dim: int

    def __call__(self, t, scale: float = 1000.0):
        half = self.dim // 2
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-np.log(10000.0) / (half - 1)))
        args = scale * t[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimestepEmbedding(nn.Module):
    """Linear-SiLU-Linear time MLP (`decoder.py:33-49`)."""

    time_embed_dim: int

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.time_embed_dim, kernel_init=_kaiming_relu())(emb)
        emb = jax.nn.silu(emb)
        return nn.Dense(self.time_embed_dim, kernel_init=_kaiming_relu())(emb)


class Block1D(nn.Module):
    """Conv k3 -> GroupNorm(8) -> Mish, mask in/out (`decoder.py:51-66`)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, mask):
        x = nn.Conv(self.out_channels, (3,), padding="SAME", kernel_init=_kaiming_relu())(x * mask)
        x = nn.GroupNorm(num_groups=8, epsilon=1e-5)(x)
        return mish(x) * mask


class ResnetBlock1D(nn.Module):
    """Two Block1Ds with FiLM-style additive time injection (`decoder.py:68-86`)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, mask, t_emb):
        h = Block1D(self.out_channels)(x, mask)
        t = nn.Dense(self.out_channels, kernel_init=_kaiming_relu())(mish(t_emb))
        h = h + t[:, None, :]
        h = Block1D(self.out_channels)(h, mask)
        res = nn.Conv(self.out_channels, (1,), kernel_init=_kaiming_relu())(x * mask)
        return h + res


class Downsample1D(nn.Module):
    """Stride-2 conv downsample (`decoder.py:88-98`)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.dim, (3,), strides=(2,), padding=[(1, 1)], kernel_init=_kaiming_relu()
        )(x)


class Upsample1D(nn.Module):
    """ConvTranspose(k=4, s=2, p=1) upsample (`decoder.py:100-116`).

    torch ConvTranspose1d(k,s,p) == conv over the stride-dilated input padded with
    k-1-p on both sides, with a flipped kernel; flax ConvTranspose applies `padding`
    to the dilated input directly, so the torch-parity spec is [(k-1-p, k-1-p)] with
    transpose_kernel=True (output length 2*T for k=4, s=2, p=1).
    """

    dim: int

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.dim, (4,), strides=(2,), padding=[(2, 2)],
            transpose_kernel=True, kernel_init=_kaiming_relu(),
        )(x)


def _truncate_mask(mask, new_len):
    """Reference mask 'downsampling': plain truncation (`decoder.py:311-316`)."""
    return mask[:, :new_len, :]


def _nearest_upsample_mask(mask, new_len):
    """Reference mask re-expansion: F.interpolate nearest (`decoder.py:357-364`)."""
    old_len = mask.shape[1]
    if new_len == old_len:
        return mask
    if new_len == 2 * old_len:
        return jnp.repeat(mask, 2, axis=1)
    idx = (jnp.arange(new_len) * old_len) // new_len
    return mask[:, idx, :]


class Decoder(nn.Module):
    """U-Net velocity estimator v(x, t | mu) (`decoder.py:118-371`)."""

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, mask, mu, t, *, deterministic: bool = True,
                 seq_axis: Optional[str] = None):
        """
        Args:
            x: (B, T, n_feats) noisy sample.
            mask: (B, T, 1) 0/1 float mask; T must be a multiple of 2.
            mu: (B, T, n_feats) aligned encoder condition.
            t: (B,) flow time in [0, 1].
            seq_axis: optional mesh axis name; the transformer blocks run ring
               attention with mel-time sharded over it (every internal resolution
               must divide by the axis size).
        Returns:
            (B, T, out_channels) velocity field.
        """
        cfg = self.cfg
        time_embed_dim = cfg.channels[0] * 4
        # Sinusoidal angles are computed in f32 (bf16 time values would corrupt the
        # scale-1000 embedding); the embedding then joins the activation dtype.
        t_emb = SinusoidalPosEmb(cfg.in_channels)(t.astype(jnp.float32))
        t_emb = TimestepEmbedding(time_embed_dim)(t_emb.astype(x.dtype))

        x = jnp.concatenate([x, mu], axis=-1)

        # Optional per-block rematerialization (see DecoderConfig.remat).
        # nn.remat RENAMES the wrapped class (Checkpoint<cls>), which would shift
        # flax's auto-generated parameter names — so blocks are ALWAYS created
        # with explicit names matching the unwrapped auto-names, keeping the
        # parameter tree identical across remat settings. static_argnums counts
        # `self` as 0 -> deterministic is arg 3, seq_axis arg 4 of
        # BasicTransformerBlock.__call__.
        if cfg.remat is not None:
            policy = {"full": None,
                      "dots": jax.checkpoint_policies.checkpoint_dots}[cfg.remat]
            ResBlkCls = nn.remat(ResnetBlock1D, prevent_cse=False, policy=policy)
            TfmBlkCls = nn.remat(BasicTransformerBlock, prevent_cse=False,
                                 policy=policy, static_argnums=(3, 4))
        else:
            ResBlkCls, TfmBlkCls = ResnetBlock1D, BasicTransformerBlock
        counters = {"res": 0, "tfm": 0}

        def ResBlk(ch):
            m = ResBlkCls(ch, name=f"ResnetBlock1D_{counters['res']}")
            counters["res"] += 1
            return m

        def transformer_stack(h, m2d):
            for _ in range(cfg.n_blocks):
                blk = TfmBlkCls(
                    dim=h.shape[-1],
                    num_attention_heads=cfg.num_heads,
                    attention_head_dim=cfg.attention_head_dim,
                    dropout=cfg.dropout,
                    activation_fn="gelu",
                    attn_impl=cfg.attn_impl,
                    name=f"BasicTransformerBlock_{counters['tfm']}",
                )
                counters["tfm"] += 1
                h = blk(h, m2d, deterministic, seq_axis)
            return h

        hiddens = []
        masks = [mask]
        n_levels = len(cfg.channels)

        # ---- down path -------------------------------------------------------
        for i, ch in enumerate(cfg.channels):
            is_last = i == n_levels - 1
            mask_down = masks[-1]
            x = ResBlk(ch)(x, mask_down, t_emb)
            x = transformer_stack(x, mask_down[:, :, 0])
            hiddens.append(x)
            if not is_last:
                assert x.shape[1] % 2 == 0, "mel length must be padded to a multiple of 2^downsamples"
                x = Downsample1D(ch)(x * mask_down)
                masks.append(_truncate_mask(mask_down, x.shape[1]))
            else:
                x = nn.Conv(ch, (3,), padding="SAME", kernel_init=_kaiming_relu())(x * mask_down)
                masks.append(mask_down)

        masks = masks[:-1]
        mask_mid = masks[-1]

        # ---- mid path --------------------------------------------------------
        for _ in range(cfg.num_mid_blocks):
            x = ResBlk(cfg.channels[-1])(x, mask_mid, t_emb)
            x = transformer_stack(x, mask_mid[:, :, 0])

        # ---- up path ---------------------------------------------------------
        up_channels = tuple(reversed(cfg.channels)) + (cfg.channels[0],)
        for i in range(len(up_channels) - 1):
            out_ch = up_channels[i + 1]
            is_last = i == len(up_channels) - 2
            mask_up = masks.pop()
            hidden = hiddens.pop()
            # Static shapes padded to multiples of 2^downsamples make the reference's
            # nearest-interp mismatch branch (`decoder.py:338-339`) unreachable.
            assert x.shape[1] == hidden.shape[1], "skip-join length mismatch: pad mel with fix_len_compatibility"
            x = jnp.concatenate([x, hidden], axis=-1)
            x = ResBlk(out_ch)(x, mask_up, t_emb)
            x = transformer_stack(x, mask_up[:, :, 0])
            if not is_last:
                x = Upsample1D(out_ch)(x * mask_up)
                mask_up = _nearest_upsample_mask(mask_up, x.shape[1])
            else:
                x = nn.Conv(out_ch, (3,), padding="SAME", kernel_init=_kaiming_relu())(x * mask_up)

        # ---- head ------------------------------------------------------------
        x = nn.Conv(cfg.channels[0], (3,), padding="SAME", kernel_init=_kaiming_relu())(x * mask_up)
        x = nn.GroupNorm(num_groups=8, epsilon=1e-5)(x)
        x = mish(x)
        out = nn.Conv(cfg.out_channels, (1,), kernel_init=_kaiming_relu())(x * mask_up)
        return out * mask
