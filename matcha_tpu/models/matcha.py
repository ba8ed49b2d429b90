"""MatchaTTS model: losses, alignment, and synthesis.

TPU-native reimplementation of the reference top-level module
(`/root/reference/matcha/models/matcha_tts.py`): text encoder + MAS alignment +
duration/prior/flow-matching losses for training, and duration-driven alignment +
CFM ODE sampling for inference.

Everything is a pure function of a parameter pytree with static shapes:

  * training `compute_losses`: one fused jittable graph, MAS included (Pallas kernel on
    TPU — no host round-trip, unlike the reference's `.cpu().numpy()` detour at
    `monotonic_align/__init__.py:48-55`);
  * inference is split in two jittable stages so the mel-frame budget stays static:
    `encode_durations` predicts per-token durations, the host picks a padded frame
    bucket, and `decode_fixed` runs path-building + ODE sampling at that bucket. The
    fully-jitted `synthesise_fixed` fuses both when a static budget is known up front.

Layout: activations are feature-last (B, T, C); the reference's channels-first arrays
correspond to transposes at the API boundary.

Preserved reference quirks (SURVEY.md §7): `length_scale` multiplies AFTER ceil
(`matcha_tts.py:219`); prior loss keeps the +log(2*pi) constant inside the masked sum
(`matcha_tts.py:320`); mel statistics default to identity (mean 0 / std 1,
`matcha_tts.py:174-176`).
"""

import math
from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from matcha_tpu.flow import SIGMA_MIN, cfm_loss, sample_cfm
from matcha_tpu.nn.decoder import Decoder, DecoderConfig
from matcha_tpu.nn.encoder import EncoderConfig, TextEncoder
from matcha_tpu.ops import duration_loss, generate_path, maximum_path, sequence_mask


@dataclass(frozen=True)
class MatchaConfig:
    """Canonical hyperparameters (`matcha_tts.py:104-176`, the `train.py:75-79` path)."""

    n_vocab: int = 150
    n_feats: int = 80
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    solver: str = "euler"
    sigma_min: float = SIGMA_MIN
    prior_loss: bool = True
    mel_mean: float = 0.0
    mel_std: float = 1.0


class MatchaTTS(nn.Module):
    """Flagship TTS model. Use via `.apply(params, ..., method=...)`."""

    cfg: MatchaConfig

    def setup(self):
        self.encoder = TextEncoder(self.cfg.encoder)
        self.decoder = Decoder(self.cfg.decoder)

    # ------------------------------------------------------------------ losses
    def compute_losses(
        self,
        x,
        x_lengths,
        y,
        y_lengths,
        *,
        deterministic: bool = False,
        mas_impl: str = "auto",
        durations: Optional[jnp.ndarray] = None,
        out_size: Optional[int] = None,
        decoder_dtype: Optional[jnp.dtype] = None,
    ):
        """Training forward (`matcha_tts.py:247-325`).

        Args:
            x: (B, Tx) token ids; x_lengths: (B,).
            y: (B, Ty, n_feats) target log-mel; y_lengths: (B,). Ty must be a multiple
               of 2**decoder downsamples. Per sample, y_lengths >= x_lengths is a MAS
               precondition (enforced at collate time — see ops.maximum_path).
            durations: optional precomputed (B, Tx) durations (skips MAS).
            out_size: optional static crop length — the decoder trains on a random
               window of this many frames per sample (`matcha_tts.py:290-312`; dormant
               in the reference's own training config). Must be a multiple of
               2**decoder downsamples and <= Ty.
            decoder_dtype: optional compute dtype for the U-Net estimator (mixed
               precision): its inputs are cast to this dtype and its output upcast to
               f32 before the MSE. Pair with bf16-cast decoder PARAMETERS (see
               matcha_tpu/models/precision.py `mixed_precision_params`) so the
               FLOP-dominant decoder runs on the MXU in bf16 while MAS, duration and
               prior losses stay f32.
        Returns:
            dict(dur_loss, prior_loss, diff_loss, attn)
        """
        cfg = self.cfg
        mu_x, logw, x_mask = self.encoder(x, x_lengths, deterministic=deterministic)
        y_mask = sequence_mask(y_lengths, y.shape[1]).astype(x_mask.dtype)[:, :, None]
        attn_mask = x_mask[:, :, 0][:, :, None] * y_mask[:, :, 0][:, None, :]  # (B,Tx,Ty)

        if durations is not None:
            attn = generate_path(durations, attn_mask)
        else:
            # Gaussian log-prior score between every (token, frame) pair
            # (`matcha_tts.py:277-282`) — three MXU contractions.
            # The whole alignment search runs gradient-free (reference wraps it in
            # torch.no_grad(), `matcha_tts.py:276`); stopping gradients on the inputs
            # also keeps AD from trying to differentiate the Pallas kernel.
            mu_sg = jax.lax.stop_gradient(mu_x)
            const = -0.5 * math.log(2 * math.pi) * cfg.n_feats
            s_yy = -0.5 * jnp.sum(y**2, axis=-1)  # (B, Ty)
            cross = jnp.einsum("bxf,byf->bxy", mu_sg, y)
            s_mm = -0.5 * jnp.sum(mu_sg**2, axis=-1)  # (B, Tx)
            log_prior = s_yy[:, None, :] + cross + s_mm[:, :, None] + const
            # lengths passed EXPLICITLY: deriving them from the mask inside this
            # fused graph hit an XLA reduction miscompile (see maximum_path_pallas)
            attn = maximum_path(log_prior, jax.lax.stop_gradient(attn_mask),
                                impl=mas_impl, t_x=x_lengths, t_y=y_lengths)
            attn = jax.lax.stop_gradient(attn)

        # Duration loss on log-domain frame counts (`matcha_tts.py:287-288`).
        logw_target = jnp.log(1e-8 + jnp.sum(attn, axis=-1))[:, :, None] * x_mask
        dur = duration_loss(logw, logw_target, x_lengths)

        if out_size is not None and out_size < y.shape[1]:
            # Random fixed-length window per sample for memory-bounded decoder
            # training (`matcha_tts.py:290-312`), static-shape via dynamic_slice.
            rng_crop = self.make_rng("crop") if not self.is_initializing() else jax.random.PRNGKey(0)
            max_offset = jnp.maximum(y_lengths - out_size, 0)
            u = jax.random.uniform(rng_crop, (y.shape[0],))
            offsets = jnp.floor(u * jnp.maximum(max_offset, 1)).astype(jnp.int32)
            offsets = jnp.minimum(offsets, max_offset)

            def crop_one(y_i, attn_i, off):
                y_c = jax.lax.dynamic_slice_in_dim(y_i, off, out_size, axis=0)
                a_c = jax.lax.dynamic_slice_in_dim(attn_i, off, out_size, axis=1)
                return y_c, a_c

            y, attn = jax.vmap(crop_one)(y, attn, offsets)
            y_cut_lengths = jnp.minimum(y_lengths, out_size)
            y_mask = sequence_mask(y_cut_lengths, out_size).astype(x_mask.dtype)[:, :, None]
            y = y * y_mask
            attn = attn * y_mask[:, :, 0][:, None, :]

        # Aligned condition mu_y = attn^T mu_x (`matcha_tts.py:314-315`).
        mu_y = jnp.einsum("bxy,bxf->byf", attn, mu_x)

        if decoder_dtype is None:
            estimator = lambda xt, m, mu, t: self.decoder(
                xt, m, mu, t, deterministic=deterministic
            )
        else:
            dt = decoder_dtype
            estimator = lambda xt, m, mu, t: self.decoder(
                xt.astype(dt), m.astype(dt), mu.astype(dt), t,
                deterministic=deterministic,
            ).astype(jnp.float32)
        rng = self.make_rng("cfm") if not self.is_initializing() else jax.random.PRNGKey(0)
        diff, _ = cfm_loss(estimator, rng, y, y_mask, mu_y, sigma_min=cfg.sigma_min)

        if cfg.prior_loss:
            prior = jnp.sum(0.5 * ((y - mu_y) ** 2 + math.log(2 * math.pi)) * y_mask)
            prior = prior / (jnp.sum(y_mask) * cfg.n_feats)
        else:
            prior = jnp.zeros(())

        return {"dur_loss": dur, "prior_loss": prior, "diff_loss": diff, "attn": attn}

    # --------------------------------------------------------------- inference
    def encode_durations(self, x, x_lengths, length_scale: float = 1.0):
        """Stage 1: encoder forward -> (mu_x, per-token durations, frame totals).

        Durations follow `matcha_tts.py:218-220`: w = exp(logw) * mask,
        w_ceil = ceil(w) * length_scale (reference applies the scale AFTER ceil).
        """
        mu_x, logw, x_mask = self.encoder(x, x_lengths, deterministic=True)
        w = jnp.exp(logw) * x_mask
        w_ceil = jnp.ceil(w) * length_scale
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=(1, 2)), min=1.0).astype(jnp.int32)
        return mu_x, w_ceil[:, :, 0], x_mask, y_lengths

    def decode_fixed(
        self,
        mu_x,
        w_ceil,
        x_mask,
        y_lengths,
        y_max_length: int,
        n_timesteps: int,
        temperature: float = 1.0,
        seq_axis: Optional[str] = None,
        z: Optional[jnp.ndarray] = None,
    ):
        """Stage 2: alignment + ODE decode at a static frame budget `y_max_length`.

        `z`: optional (B, y_max_length, n_feats) pre-temperature standard-normal
        noise. When given, the "noise" rng collection is not consumed —
        deterministic decode for serving and for parity tests against the torch
        oracle (which cannot share a PRNG with JAX).

        `y_max_length` must be a multiple of 2**decoder downsamples
        (fix_len_compatibility, `matcha_tts.py:222`).

        `seq_axis`: optional mesh axis name for sequence/context parallelism
        (SURVEY.md §2.2): mel-time of the decoder activations is shard-constrained
        over that axis; the SPMD partitioner parallelizes the U-Net convs (halo
        exchanges) across it and the transformer blocks switch to blockwise RING
        attention (K/V ppermute over ICI, matcha_tpu/parallel/ring_attention.py)
        instead of gathering full K/V per device.
        """
        cfg = self.cfg
        y_lengths = jnp.minimum(y_lengths, y_max_length)
        y_mask = sequence_mask(y_lengths, y_max_length).astype(mu_x.dtype)[:, :, None]
        attn_mask = x_mask[:, :, 0][:, :, None] * y_mask[:, :, 0][:, None, :]
        # Path construction in f32: bf16 duration cumsums lose integer exactness
        # past 256 frames.
        attn = generate_path(
            w_ceil.astype(jnp.float32), attn_mask.astype(jnp.float32)
        ).astype(mu_x.dtype)  # (B, Tx, Ty)

        mu_y = jnp.einsum("bxy,bxf->byf", attn, mu_x)
        if seq_axis is not None:
            from jax.lax import with_sharding_constraint
            from jax.sharding import PartitionSpec as P

            mu_y = with_sharding_constraint(mu_y, P(None, seq_axis, None))
            y_mask = with_sharding_constraint(y_mask, P(None, seq_axis, None))

        estimator = lambda xt, m, mu, t: self.decoder(
            xt, m, mu, t, deterministic=True, seq_axis=seq_axis
        )
        if z is None:
            rng = self.make_rng("noise") if not self.is_initializing() else jax.random.PRNGKey(0)
        else:
            rng = None
        dec = sample_cfm(
            estimator, rng, mu_y, y_mask, n_timesteps, temperature, solver=cfg.solver,
            z=z,
        )
        dec = dec * y_mask
        mel = dec * cfg.mel_std + cfg.mel_mean  # denormalize (`matcha_tts.py:242`)
        return {
            "encoder_outputs": mu_y,
            "decoder_outputs": dec,
            "mel": mel,
            "attn": attn,
            "mel_lengths": y_lengths,
        }

    def synthesise_fixed(
        self,
        x,
        x_lengths,
        y_max_length: int,
        n_timesteps: int,
        temperature: float = 1.0,
        length_scale: float = 1.0,
        seq_axis: Optional[str] = None,
        z: Optional[jnp.ndarray] = None,
    ):
        """Fully-jitted text -> mel at a static frame budget (`matcha_tts.py:179-245`)."""
        mu_x, w_ceil, x_mask, y_lengths = self.encode_durations(x, x_lengths, length_scale)
        return self.decode_fixed(
            mu_x, w_ceil, x_mask, y_lengths, y_max_length, n_timesteps, temperature,
            seq_axis=seq_axis, z=z,
        )

    def __call__(self, x, x_lengths, y, y_lengths):
        """Initialization entry point (traces the full train path)."""
        return self.compute_losses(
            x, x_lengths, y, y_lengths, deterministic=True, mas_impl="ref"
        )


def create_model(cfg: MatchaConfig = MatchaConfig()):
    return MatchaTTS(cfg)


def tiny_config(n_feats: int = 8) -> MatchaConfig:
    """Reduced-width config for bring-up smoke runs (cli.train --tiny) and tests.

    Same topology as the reference defaults (prenet + transformer encoder,
    down/mid/up U-Net) at widths small enough to train on a CPU host in seconds —
    used to validate distributed wiring (mesh bring-up, multi-process collectives,
    checkpoint layout) without full-size compute.
    """
    return MatchaConfig(
        n_feats=n_feats,
        encoder=EncoderConfig(n_feats=n_feats, n_channels=16, filter_channels=32,
                              n_heads=2, n_layers=1, filter_channels_dp=16),
        decoder=DecoderConfig(in_channels=2 * n_feats, out_channels=n_feats,
                              channels=(16, 16), attention_head_dim=8, num_heads=2,
                              num_mid_blocks=1),
    )


def init_params(model: MatchaTTS, rng: jax.Array, tx: int = 16, ty: int = 32):
    """Initialize a parameter pytree with tiny dummy shapes.

    Jitted: eager flax init dispatches one tiny op at a time, each paying a
    host->device round trip (minutes through the axon TPU tunnel); a single
    compiled init graph takes seconds.
    """
    x = jnp.zeros((2, tx), jnp.int32)
    xl = jnp.full((2,), tx, jnp.int32)
    y = jnp.zeros((2, ty, model.cfg.n_feats), jnp.float32)
    yl = jnp.full((2,), ty, jnp.int32)

    def init(r):
        return model.init({"params": r, "cfm": r, "noise": r, "dropout": r}, x, xl, y, yl)

    return jax.jit(init)(rng)["params"]
