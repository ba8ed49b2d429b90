"""HiFi-GAN vocoder training: fused on-chip GAN step (generator + MPD/MSD).

The reference ships the v1 discriminators and LSGAN/feature-matching losses
(`/root/reference/hifi_gan/models.py:128-283`) and the training hyperparameters
(`/root/reference/checkpts/config.json`) but no vocoder training loop; this module
makes them functional. Recipe = the standard HiFi-GAN v1 objective the reference's
committed pieces imply:

  disc step:  L_D = LSGAN(MPD) + LSGAN(MSD)                (models.py:260-272)
  gen step:   L_G = LSGAN_adv(MPD+MSD) + 2*L_FM(MPD+MSD)   (models.py:251-283)
              + 45 * L1(mel(y), mel(y_hat))                (upstream HiFi-GAN weight)

TPU-native design:
  * ONE jitted graph per optimizer step: input-mel extraction (framed rFFT + MXU
    matmul), generator forward, both discriminators on (y, y_hat), disc AdamW update,
    then generator update against the refreshed discriminator — no host round-trips.
  * Static shapes: fixed (B, segment_size) waveform segments; segment_size must be a
    multiple of hop so mel frames x 256 == samples exactly.
  * Data parallel via the ('data','model') mesh: batch sharded on 'data', parameters
    replicated; gradient all-reduce is inserted by the SPMD partitioner.
  * The mel-reconstruction loss uses a full-band filterbank (fmax = sr/2), matching
    config.json's `"fmax_loss": null`; the generator input mel keeps fmax 8000.
"""

import time
from dataclasses import dataclass, replace
from functools import partial
from pathlib import Path
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from matcha_tpu.audio.mel import MelConfig, mel_spectrogram
from matcha_tpu.data.audio_dataset import AudioDataConfig, wav_batch_iterator
from matcha_tpu.models.hifigan import (
    Generator,
    HiFiGANConfig,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)


@dataclass(frozen=True)
class VocoderTrainConfig:
    """Training hyperparameters (`/root/reference/checkpts/config.json`)."""

    lr: float = 4e-4
    betas: tuple = (0.8, 0.99)
    lr_decay: float = 0.999  # per-epoch exponential decay
    mel_loss_weight: float = 45.0
    max_epochs: int = 100
    log_every: int = 10
    ckpt_dir: str = "checkpoints_vocoder"
    keep_top_k: int = 3
    seed: int = 1234
    # K>1: run K GAN steps per device dispatch (lax.scan over a stacked (K, B, T)
    # segment superbatch). Vocoder batches are all the same static shape, so groups
    # always fill — pure dispatch-latency amortization, no reordering at all.
    steps_per_dispatch: int = 1
    # checkpoint every N epochs (final epoch always saved). 1 = reference parity
    # (Lightning saves per val epoch); through a high-latency device tunnel the
    # per-epoch Orbax write can dominate short epochs (~30 s vs 2.7 s of training
    # at the synthetic evidence-run scale), so long runs should raise this.
    ckpt_every_epochs: int = 1


class Discriminators(nn.Module):
    """MPD + MSD under one parameter tree (single apply per step).

    `mpd_channels` / `msd_spec` default to the reference v1 sizes; tests shrink them.
    """

    mpd_channels: Optional[tuple] = None
    msd_spec: Optional[tuple] = None

    @nn.compact
    def __call__(self, y, y_hat):
        mpd_kw = {} if self.mpd_channels is None else {"channels": self.mpd_channels}
        msd_kw = {} if self.msd_spec is None else {"spec": self.msd_spec}
        p = MultiPeriodDiscriminator(name="mpd", **mpd_kw)(y, y_hat)
        s = MultiScaleDiscriminator(name="msd", **msd_kw)(y, y_hat)
        return p, s


def make_optimizers(cfg: VocoderTrainConfig, steps_per_epoch: int):
    sched = optax.exponential_decay(
        cfg.lr, transition_steps=max(steps_per_epoch, 1),
        decay_rate=cfg.lr_decay, staircase=True,
    )

    def adamw():
        return optax.adamw(sched, b1=cfg.betas[0], b2=cfg.betas[1])

    return adamw(), adamw()


def make_vocoder_step(
    gen: Generator,
    disc: Discriminators,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    cfg: VocoderTrainConfig,
    mel_cfg: MelConfig,
):
    """Build the jitted fused GAN step: (state, wav_batch) -> new state + metrics."""
    loss_mel_cfg = replace(mel_cfg, fmax=None)  # fmax_loss: null -> full band

    def input_mel(y):
        # (B, T) wav -> (B, frames, n_mels) feature-last generator conditioning
        return jnp.swapaxes(mel_spectrogram(mel_cfg, y), -1, -2)

    def d_loss_fn(disc_params, y, y_hat):
        (pr, pg, _, _), (sr, sg, _, _) = disc.apply({"params": disc_params}, y, y_hat)
        loss_p, _, _ = discriminator_loss(pr, pg)
        loss_s, _, _ = discriminator_loss(sr, sg)
        return loss_p + loss_s

    def g_loss_fn(gen_params, disc_params, y, mel_y_loss):
        y_hat = gen.apply({"params": gen_params}, input_mel(y))
        (pr, pg, pfr, pfg), (sr, sg, sfr, sfg) = disc.apply(
            {"params": disc_params}, y, y_hat
        )
        mel_hat = mel_spectrogram(loss_mel_cfg, y_hat)
        mel_l1 = jnp.mean(jnp.abs(mel_y_loss - mel_hat)) * cfg.mel_loss_weight
        fm = feature_loss(pfr, pfg) + feature_loss(sfr, sfg)
        adv = generator_loss(pg)[0] + generator_loss(sg)[0]
        return adv + fm + mel_l1, {"mel_l1": mel_l1, "fm": fm, "adv": adv}

    def one_step(gen_params, disc_params, gen_opt, disc_opt, y):
        # Discriminator update on a detached generator sample (upstream order).
        y_hat = jax.lax.stop_gradient(gen.apply({"params": gen_params}, input_mel(y)))
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc_params, y, y_hat)
        d_updates, disc_opt = tx_d.update(d_grads, disc_opt, disc_params)
        disc_params = optax.apply_updates(disc_params, d_updates)

        # Generator update against the refreshed discriminator.
        mel_y_loss = mel_spectrogram(loss_mel_cfg, y)
        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            gen_params, disc_params, y, mel_y_loss
        )
        g_updates, gen_opt = tx_g.update(g_grads, gen_opt, gen_params)
        gen_params = optax.apply_updates(gen_params, g_updates)

        metrics = dict(aux, d_loss=d_loss, g_loss=g_loss)
        return gen_params, disc_params, gen_opt, disc_opt, metrics

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def step(gen_params, disc_params, gen_opt, disc_opt, y):
        return one_step(gen_params, disc_params, gen_opt, disc_opt, y)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def scan_steps(gen_params, disc_params, gen_opt, disc_opt, ys):
        # K GAN steps in one dispatch: ys is a (K, B, T) stacked segment superbatch
        # (all vocoder batches share one static shape, so grouping is trivial)
        def body(carry, y):
            gp, dp, go, do, metrics = one_step(*carry, y)
            return (gp, dp, go, do), metrics

        carry, metrics = jax.lax.scan(
            body, (gen_params, disc_params, gen_opt, disc_opt), ys
        )
        return (*carry, metrics)

    return step, scan_steps


def make_vocoder_eval(gen: Generator, mel_cfg: MelConfig):
    """Jitted validation metric: full-band mel L1 of resynthesized segments."""
    loss_mel_cfg = replace(mel_cfg, fmax=None)

    @jax.jit
    def eval_step(gen_params, y):
        mel_in = jnp.swapaxes(mel_spectrogram(mel_cfg, y), -1, -2)
        y_hat = gen.apply({"params": gen_params}, mel_in)
        return jnp.mean(
            jnp.abs(mel_spectrogram(loss_mel_cfg, y) - mel_spectrogram(loss_mel_cfg, y_hat))
        )

    return eval_step


def load_generator_for_inference(ckpt_dir: str, prefer: str = "best"):
    """Load a VocoderTrainer Orbax checkpoint and fold it for serving.

    Closes the train->serve loop the reference only has for its released torch
    checkpoint (`/root/reference/generate_HifiGan.py:57-79` loads `generator_v1`
    then calls `remove_weight_norm()`): picks the best-val (or latest) checkpoint
    from `ckpt_dir`, extracts the weight-normalized generator parameters, and folds
    the weight norm into plain kernels (matcha_tpu.models.hifigan.fold_weight_norm).

    Returns params for `Generator(cfg, weight_norm=False)`.
    """
    from matcha_tpu.models.hifigan import fold_weight_norm
    from matcha_tpu.train.checkpoints import CheckpointStore

    # Template-free params-only restore: the saved topology is the trainer's own
    # {"params": {"gen", "disc"}, "opt_state": ...} tree.
    params = CheckpointStore(ckpt_dir).restore_params(prefer)
    return fold_weight_norm(params["gen"])


class VocoderTrainer:
    """End-to-end HiFi-GAN training driver (single-host or mesh data-parallel)."""

    def __init__(
        self,
        gen_cfg: HiFiGANConfig = HiFiGANConfig(),
        train_cfg: VocoderTrainConfig = VocoderTrainConfig(),
        data_cfg: AudioDataConfig = AudioDataConfig(),
        mel_cfg: MelConfig = MelConfig(),
        mesh=None,
        disc: Optional[Discriminators] = None,
    ):
        hop = int(np.prod(gen_cfg.upsample_rates))
        assert hop == mel_cfg.hop_size, (
            f"generator upsampling x{hop} must equal the mel hop {mel_cfg.hop_size}"
        )
        assert data_cfg.segment_size % hop == 0, "segment_size must be a hop multiple"
        self.gen_cfg = gen_cfg
        self.train_cfg = train_cfg
        self.data_cfg = data_cfg
        self.mel_cfg = mel_cfg
        self.gen = Generator(gen_cfg, weight_norm=True)
        self.disc = disc if disc is not None else Discriminators()
        if mesh is None:
            from matcha_tpu.parallel import make_mesh

            mesh = make_mesh()
        self.mesh = mesh
        self._ckpt = None

    @property
    def checkpoints(self):
        if self._ckpt is None:
            from matcha_tpu.train.checkpoints import CheckpointStore

            self._ckpt = CheckpointStore(self.train_cfg.ckpt_dir, self.train_cfg.keep_top_k)
        return self._ckpt

    def init_state(self, steps_per_epoch: int):
        from matcha_tpu.parallel import shard_params

        seg = self.data_cfg.segment_size
        frames = seg // self.mel_cfg.hop_size
        rng = jax.random.PRNGKey(self.train_cfg.seed)
        mel0 = jnp.zeros((1, frames, self.mel_cfg.n_mels))
        wav0 = jnp.zeros((1, seg))
        # Initialization MUST be jitted: eager flax init dispatches thousands of tiny
        # ops, each paying a host->device round trip (~4 min gen / ~12 min disc
        # measured through the axon tunnel); one compiled graph takes seconds.
        gen_params = jax.jit(lambda r: self.gen.init(r, mel0))(rng)["params"]
        disc_params = jax.jit(lambda r: self.disc.init(r, wav0, wav0))(rng)["params"]
        gen_params = shard_params(self.mesh, gen_params)
        disc_params = shard_params(self.mesh, disc_params)
        tx_g, tx_d = make_optimizers(self.train_cfg, steps_per_epoch)
        # Pin every optimizer leaf (incl. step counters) to the replicated mesh
        # sharding: params are replicated (no TP rules here), and mixed
        # single-device/mesh placements fail jit after checkpoint restore.
        from matcha_tpu.parallel import replicated

        rep = replicated(self.mesh)
        gen_opt = jax.device_put(tx_g.init(gen_params), rep)
        disc_opt = jax.device_put(tx_d.init(disc_params), rep)
        return gen_params, disc_params, gen_opt, disc_opt, tx_g, tx_d

    def fit(self, train_ds, val_ds=None, max_epochs: Optional[int] = None, resume: bool = True):
        from matcha_tpu.parallel import put_global_batch
        from matcha_tpu.train.trainer import MetricLogger

        cfg = self.train_cfg
        max_epochs = max_epochs if max_epochs is not None else cfg.max_epochs
        steps_per_epoch = max(
            len(train_ds) // (self.data_cfg.batch_size * jax.process_count()), 1
        )
        gen_p, disc_p, gen_opt, disc_opt, tx_g, tx_d = self.init_state(steps_per_epoch)

        step, start_epoch = 0, 0
        if resume:
            restored = self.checkpoints.restore_latest(
                {"gen": gen_p, "disc": disc_p}, {"gen": gen_opt, "disc": disc_opt}
            )
            if restored is not None:
                params, opts, step, start_epoch = restored
                gen_p, disc_p = params["gen"], params["disc"]
                gen_opt, disc_opt = opts["gen"], opts["disc"]
                print(f"resumed vocoder training from step {step} (epoch {start_epoch})")

        step_fn, scan_fn = make_vocoder_step(self.gen, self.disc, tx_g, tx_d, cfg, self.mel_cfg)
        eval_fn = make_vocoder_eval(self.gen, self.mel_cfg)
        logger = MetricLogger(Path(cfg.ckpt_dir) / "logs")
        k_dispatch = max(cfg.steps_per_dispatch, 1)

        with self.mesh:
            for epoch in range(start_epoch, max_epochs):
                t0 = time.time()
                buf = []  # pending segment batches for the K-step scan dispatch
                for y in wav_batch_iterator(
                    train_ds, self.data_cfg, epoch=epoch,
                    process_index=jax.process_index(), process_count=jax.process_count(),
                ):
                    if k_dispatch > 1:
                        buf.append(np.asarray(y))
                        if len(buf) < k_dispatch:
                            continue
                        ys = put_global_batch(self.mesh, np.stack(buf),
                                              stacked_steps=True)
                        buf = []
                        gen_p, disc_p, gen_opt, disc_opt, metrics_k = scan_fn(
                            gen_p, disc_p, gen_opt, disc_opt, ys
                        )
                        for i in range(k_dispatch):
                            if (step + i) % cfg.log_every == 0:
                                logger.log(step + i,
                                           {kk: v[i] for kk, v in metrics_k.items()},
                                           prefix="train/", epoch=epoch)
                        step += k_dispatch
                        continue
                    y = put_global_batch(self.mesh, np.asarray(y))
                    gen_p, disc_p, gen_opt, disc_opt, metrics = step_fn(
                        gen_p, disc_p, gen_opt, disc_opt, y
                    )
                    if step % cfg.log_every == 0:
                        logger.log(step, metrics, prefix="train/", epoch=epoch)
                    step += 1
                # epoch-end remainder (< K batches): single-step graph, no recompiles
                for y in buf:
                    y = put_global_batch(self.mesh, y)
                    gen_p, disc_p, gen_opt, disc_opt, metrics = step_fn(
                        gen_p, disc_p, gen_opt, disc_opt, y
                    )
                    if step % cfg.log_every == 0:
                        logger.log(step, metrics, prefix="train/", epoch=epoch)
                    step += 1

                val_loss = float("inf")
                if val_ds is not None and len(val_ds) > 0:
                    vals = []
                    for y in wav_batch_iterator(
                        val_ds, self.data_cfg, epoch=0, shuffle=False,
                        process_index=jax.process_index(),
                        process_count=jax.process_count(), drop_last=False,
                    ):
                        y = put_global_batch(self.mesh, np.asarray(y))
                        vals.append(float(eval_fn(gen_p, y)))
                    val_loss = float(np.mean(vals)) if vals else float("inf")
                logger.log(step, {"mel_l1": val_loss, "epoch_seconds": time.time() - t0},
                           prefix="val/", epoch=epoch)

                # every process participates in the distributed Orbax write;
                # cadence-gated (final epoch always saved) — see ckpt_every_epochs
                if (epoch + 1) % cfg.ckpt_every_epochs == 0 or epoch + 1 == max_epochs:
                    self.checkpoints.save(
                        step, epoch + 1,
                        {"gen": gen_p, "disc": disc_p},
                        {"gen": gen_opt, "disc": disc_opt},
                        val_loss,
                    )
        logger.close()
        return gen_p, disc_p, step
