"""Training-run analysis CLI.

Counterpart of `/root/reference/analyze_training.py`: read the metrics stream written by
the trainer (JSONL instead of TF event files), plot per-epoch duration/prior/diffusion
loss curves, and export a per-epoch CSV.

Usage:
    python -m matcha_tpu.cli.analyze [--log-dir checkpoints/logs] [--out-dir analysis]
"""

import argparse
import json
from pathlib import Path


def load_metrics(log_dir):
    rows = []
    path = Path(log_dir) / "metrics.jsonl"
    if not path.exists():
        raise FileNotFoundError(f"{path} not found — has training run?")
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    ap = argparse.ArgumentParser(description="Analyze Matcha-TTS training metrics")
    ap.add_argument("--log-dir", default="checkpoints/logs")
    ap.add_argument("--out-dir", default="analysis")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    rows = load_metrics(args.log_dir)
    df = pd.DataFrame(rows)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    losses = ["dur_loss", "prior_loss", "diff_loss", "loss"]
    fig, axes = plt.subplots(2, 2, figsize=(14, 8))
    for ax, name in zip(axes.flat, losses):
        for prefix, style in (("train/", "-"), ("val/", "--")):
            col = prefix + name
            if col in df.columns:
                sub = df.dropna(subset=[col])
                ax.plot(sub["step"], sub[col], style, label=col)
        ax.set_title(name)
        ax.set_xlabel("step")
        ax.legend()
        ax.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(out / "loss_curves.png", dpi=150)

    val_cols = [c for c in df.columns if c.startswith("val/")]
    if val_cols:
        df.dropna(subset=val_cols[:1])[["step"] + val_cols].to_csv(
            out / "val_losses.csv", index=False
        )
    df.to_csv(out / "all_metrics.csv", index=False)

    # Per-epoch aggregation + epoch-axis curves (parity of the reference's
    # step->epoch mapping and per-epoch CSV, `analyze_training.py:84-87,135-192`).
    # The trainer logs the epoch directly; older logs fall back to deriving it from
    # the running count of val rows (one per epoch).
    if "epoch" not in df.columns:
        is_val = df[val_cols[0]].notna() if val_cols else pd.Series(False, index=df.index)
        df["epoch"] = is_val[::-1].cumsum()[::-1]
        df["epoch"] = df["epoch"].max() - df["epoch"]
    loss_cols = [c for c in df.columns
                 if c.split("/")[-1] in ("dur_loss", "prior_loss", "diff_loss", "loss")]
    per_epoch = df.groupby("epoch")[loss_cols].mean()
    per_epoch.to_csv(out / "epoch_losses.csv")

    fig, axes = plt.subplots(2, 2, figsize=(14, 8))
    for ax, name in zip(axes.flat, losses):
        for prefix, style in (("train/", "-"), ("val/", "--")):
            col = prefix + name
            if col in per_epoch.columns:
                sub = per_epoch[col].dropna()
                ax.plot(sub.index, sub.values, style, label=col)
        ax.set_title(name)
        ax.set_xlabel("epoch")
        ax.legend()
        ax.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(out / "loss_curves_epoch.png", dpi=150)
    print(f"wrote {out}/loss_curves.png, loss_curves_epoch.png and CSVs "
          f"({len(df)} rows, {len(per_epoch)} epochs)")


if __name__ == "__main__":
    main()
