"""LJSpeech acquisition and split generation.

Counterpart of the reference downloader (`/root/reference/matcha/utils/data_download/
ljspeech.py`): download + extract the LJSpeech-1.1 tarball and write `train.txt` /
`val.txt` as `<wav_abspath>|<transcript>` lines with a 98/2 split.

Deviation (documented): the reference draws the split from an unseeded global RNG
(`ljspeech.py:36-37`), so its split is irreproducible; we use a fixed seed so the split
is stable across hosts — required for deterministic per-host sharding in data-parallel
training.
"""

import random
import sys
import tarfile
import urllib.request
from pathlib import Path

URL = "https://data.keithito.com/data/speech/LJSpeech-1.1.tar.bz2"
INFO_PAGE = "https://keithito.com/LJ-Speech-Dataset/"
SPLIT_SEED = 42
TRAIN_FRACTION = 0.98


def download(save_path: Path, url: str = URL):
    """Fetch the dataset tarball (network access required)."""
    save_path = Path(save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    tmp = save_path.with_suffix(".partial")
    try:
        urllib.request.urlretrieve(url, tmp)
        tmp.rename(save_path)
    except BaseException:
        if tmp.exists():
            tmp.unlink()
        raise
    return save_path


def extract(tar_path: Path, out_dir: Path):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with tarfile.open(tar_path) as tf:
        tf.extractall(out_dir)
    return out_dir


def _find_base(ljpath: Path) -> Path:
    """Locate the directory holding metadata.csv (3-way fallback like the reference)."""
    ljpath = Path(ljpath)
    if (ljpath / "metadata.csv").exists():
        return ljpath
    if (ljpath / "LJSpeech-1.1" / "metadata.csv").exists():
        return ljpath / "LJSpeech-1.1"
    for subdir in ljpath.iterdir():
        if subdir.is_dir() and "ljspeech" in subdir.name.lower():
            if (subdir / "metadata.csv").exists():
                return subdir
    raise FileNotFoundError(f"metadata.csv not found under {ljpath}")


def process_csv(ljpath, output_dir=None, seed: int = SPLIT_SEED):
    """Write train.txt / val.txt (98/2 split) from metadata.csv."""
    basepath = _find_base(Path(ljpath))
    csvpath = basepath / "metadata.csv"
    wavpath = basepath / "wavs"
    output_dir = Path(output_dir) if output_dir is not None else basepath
    output_dir.mkdir(parents=True, exist_ok=True)

    rng = random.Random(seed)
    train_count = val_count = 0
    with (
        open(csvpath, encoding="utf-8") as csvf,
        open(output_dir / "train.txt", "w", encoding="utf-8") as tf,
        open(output_dir / "val.txt", "w", encoding="utf-8") as vf,
    ):
        for line in csvf:
            parts = line.strip().split("|")
            if len(parts) < 2:
                continue
            wavfile = str(wavpath / f"{parts[0]}.wav")
            if rng.random() < TRAIN_FRACTION:
                tf.write(f"{wavfile}|{parts[1]}\n")
                train_count += 1
            else:
                vf.write(f"{wavfile}|{parts[1]}\n")
                val_count += 1
    return train_count, val_count


def prepare(output_dir="data", save_dir=None):
    """Download + extract + split (mirrors `ljspeech.py:112-171`)."""
    outpath = Path(output_dir)
    outpath.mkdir(parents=True, exist_ok=True)
    if save_dir is not None:
        tarball = Path(save_dir) / URL.rsplit("/", 1)[-1]
        if not tarball.exists():
            print(f"downloading {URL} -> {tarball}", file=sys.stderr)
            download(tarball)
    else:
        tarball = outpath / URL.rsplit("/", 1)[-1]
        if not tarball.exists():
            print(f"downloading {URL} -> {tarball}", file=sys.stderr)
            download(tarball)
    extract(tarball, outpath)
    return process_csv(outpath)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("output_dir", nargs="?", default="data")
    ap.add_argument("-s", "--save-dir", default=None)
    args = ap.parse_args()
    prepare(args.output_dir, args.save_dir)
