"""HiFi-GAN vocoder training CLI.

The reference ships the discriminators + GAN losses (`hifi_gan/models.py:128-283`) and
the training config (`checkpts/config.json`) without a training entry point; this CLI
completes the capability: train HiFi-GAN v1 on LJSpeech wavs (or synthetic data) with
the fused on-chip GAN step (`matcha_tpu/train/vocoder.py`).

Usage:
    python -m matcha_tpu.cli.train_vocoder --data train.txt            # wav|text metadata
    python -m matcha_tpu.cli.train_vocoder --data path/to/wavs_dir
    python -m matcha_tpu.cli.train_vocoder --synthetic --epochs 2      # smoke run
"""

import argparse


def main():
    from matcha_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="Train the HiFi-GAN v1 vocoder")
    ap.add_argument("--data", help="metadata file (wav|text lines) or directory of wavs")
    ap.add_argument("--val-data", help="optional validation metadata/dir")
    ap.add_argument("--synthetic", action="store_true", help="synthetic smoke-run data")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--segment-size", type=int, default=8192)
    ap.add_argument("--ckpt-dir", default="checkpoints_vocoder")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="run K GAN steps per device dispatch (lax.scan over a "
                         "stacked segment superbatch) - amortizes dispatch latency")
    ap.add_argument("--ckpt-every", type=int, default=1,
                    help="checkpoint every N epochs (final epoch always saved)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny generator/discriminators + 8 synthetic items: "
                         "multi-host bring-up smoke mode (pairs with JAX_COORDINATOR_"
                         "ADDRESS env vars, like cli.train --tiny)")
    args = ap.parse_args()

    from matcha_tpu.data.audio_dataset import (
        AudioDataConfig,
        SyntheticWavDataset,
        WavSegmentDataset,
    )
    from matcha_tpu.parallel import init_distributed
    from matcha_tpu.train.vocoder import VocoderTrainConfig, VocoderTrainer

    init_distributed()

    if args.tiny:
        args.synthetic = True
        train_ds = SyntheticWavDataset(n_items=8, segment_size=args.segment_size)
        val_ds = SyntheticWavDataset(n_items=4, segment_size=args.segment_size, seed=1)
    elif args.synthetic:
        train_ds = SyntheticWavDataset(n_items=64, segment_size=args.segment_size)
        val_ds = SyntheticWavDataset(n_items=8, segment_size=args.segment_size, seed=1)
    elif args.data:
        train_ds = WavSegmentDataset(args.data, args.segment_size)
        val_ds = WavSegmentDataset(args.val_data, args.segment_size) if args.val_data else None
    else:
        ap.error("provide --data or --synthetic")

    kwargs = {}
    if args.tiny:
        from matcha_tpu.models.hifigan import HiFiGANConfig
        from matcha_tpu.train.vocoder import Discriminators

        kwargs = dict(
            gen_cfg=HiFiGANConfig(upsample_initial_channel=16),
            disc=Discriminators(
                mpd_channels=(4, 8),
                msd_spec=((8, 15, 1, 1, 7), (8, 41, 4, 4, 20), (8, 5, 1, 1, 2)),
            ),
        )
    trainer = VocoderTrainer(
        train_cfg=VocoderTrainConfig(max_epochs=args.epochs, ckpt_dir=args.ckpt_dir,
                                     steps_per_dispatch=args.steps_per_dispatch,
                                     ckpt_every_epochs=args.ckpt_every),
        data_cfg=AudioDataConfig(batch_size=args.batch_size, segment_size=args.segment_size),
        **kwargs,
    )
    trainer.fit(train_ds, val_ds, max_epochs=args.epochs, resume=not args.no_resume)


if __name__ == "__main__":
    main()
