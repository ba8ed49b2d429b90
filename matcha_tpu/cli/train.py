"""Training CLI.

Counterpart of `/root/reference/train.py`: auto-resume from the newest checkpoint,
`--no-resume` escape hatch, LJSpeech data module, reference default hyperparameters.

Usage:
    python -m matcha_tpu.cli.train [--data-dir data/LJSpeech-1.1] [--ckpt-dir checkpoints]
        [--batch-size 16] [--max-epochs 1000] [--no-resume] [--synthetic]
"""

import argparse
from pathlib import Path


def main():
    from matcha_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="Train Matcha-TTS (TPU-native)")
    ap.add_argument("--data-dir", default="data/LJSpeech-1.1")
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--max-epochs", type=int, default=1000)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--synthetic-items", type=int, default=256,
                    help="synthetic dataset size (tuned-recipe evidence runs need "
                         "enough items to fill batch*K per dispatch)")
    ap.add_argument("--synthetic", action="store_true",
                    help="train on the synthetic dataset (smoke runs, no LJSpeech needed)")
    ap.add_argument("--tiny", action="store_true",
                    help="reduced-width model + small synthetic dataset: validates "
                         "bring-up (multi-host wiring, mesh, checkpoints) without "
                         "full-size compute; implies --synthetic")
    ap.add_argument("--mas-impl", default="auto", choices=["auto", "pallas", "ref"])
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh size")
    ap.add_argument("--precision", default="fp32", choices=["fp32", "bf16"],
                    help="bf16 = mixed precision (bf16 U-Net, f32 master weights)")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of steps 2-4 into DIR "
                         "(open in Perfetto or TensorBoard's profile tab)")
    ap.add_argument("--out-size", type=int, default=None,
                    help="memory-bounded decoder training: random crop of this many "
                         "frames per sample (multiple of 4; reference's dormant "
                         "out_size machinery, matcha_tts.py:290-312)")
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="run K gradient steps per device dispatch (lax.scan over "
                         "stacked same-shape batches) — amortizes host dispatch "
                         "latency; a pure performance knob: K-independent batch "
                         "order and fold_in rng keys keep the trajectory equal "
                         "across K (scan-fusion ulps only)")
    ap.add_argument("--ckpt-every", type=int, default=1,
                    help="checkpoint every N epochs (final epoch always saved); "
                         "raise for long runs where the Orbax write dominates "
                         "short epochs")
    args = ap.parse_args()

    from matcha_tpu.data.dataset import DataConfig, SyntheticDataset, TextMelDataset
    from matcha_tpu.data.ljspeech import process_csv
    from matcha_tpu.parallel import init_distributed, make_mesh
    from matcha_tpu.train.trainer import TrainConfig, Trainer

    init_distributed()

    model_cfg = None
    if args.tiny:
        from matcha_tpu.audio.mel import MelConfig
        from matcha_tpu.models.matcha import tiny_config

        model_cfg = tiny_config()
        mel_cfg = MelConfig(n_mels=model_cfg.n_feats)
        train_ds = SyntheticDataset(n_items=16, mel_cfg=mel_cfg, seed=0,
                                    min_frames=64, max_frames=96)
        val_ds = SyntheticDataset(n_items=8, mel_cfg=mel_cfg, seed=1,
                                  min_frames=64, max_frames=96)
    elif args.synthetic:
        train_ds = SyntheticDataset(n_items=args.synthetic_items, seed=0)
        val_ds = SyntheticDataset(n_items=max(args.synthetic_items // 8, 8), seed=1)
    else:
        data_dir = Path(args.data_dir)
        train_txt, val_txt = data_dir / "train.txt", data_dir / "val.txt"
        if not train_txt.exists() or not val_txt.exists():
            print("generating train/val split from metadata.csv ...")
            process_csv(data_dir, output_dir=data_dir)
        train_ds = TextMelDataset(train_txt)
        val_ds = TextMelDataset(val_txt)

    trainer_kwargs = {}
    if model_cfg is not None:
        trainer_kwargs["model_cfg"] = model_cfg
    data_cfg = (DataConfig(batch_size=args.batch_size, text_pad_multiple=16,
                           mel_pad_multiple=16)
                if args.tiny else DataConfig(batch_size=args.batch_size))
    trainer = Trainer(
        train_cfg=TrainConfig(ckpt_dir=args.ckpt_dir, max_epochs=args.max_epochs,
                              mas_impl=args.mas_impl, precision=args.precision,
                              profile_dir=args.profile, out_size=args.out_size,
                              steps_per_dispatch=args.steps_per_dispatch,
                              ckpt_every_epochs=args.ckpt_every),
        data_cfg=data_cfg,
        mesh=make_mesh(model=args.tp),
        **trainer_kwargs,
    )
    trainer.fit(train_ds, val_ds, max_epochs=args.max_epochs, resume=not args.no_resume)


if __name__ == "__main__":
    main()
