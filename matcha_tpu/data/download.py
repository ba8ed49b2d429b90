"""Pretrained artifact download utilities.

Counterpart of `/root/reference/matcha/utils/data_download/utils.py`: fetch released
checkpoints by URL with partial-file cleanup, plus tar/zip extraction helpers. URLs of
the reference's released artifacts are kept for users converting the original weights
(`generate.py:11`, `generate_HifiGan.py:17,27`).
"""

import tarfile
import urllib.request
import zipfile
from pathlib import Path

MATCHA_CKPT_URL = (
    "https://github.com/Raph1821/Matcha-TTS-etu-UPMC-ENSAM/releases/download/v1.0/matcha_final.ckpt"
)
HIFIGAN_V1_URL = "https://github.com/Raph1821/Matcha-TTS-etu-UPMC-ENSAM/releases/download/v1.0/generator_v1"


def download_pretrained_model(url: str, dest: str) -> Path:
    """Download `url` to `dest` unless present; clean up partial files on failure."""
    dest = Path(dest)
    if dest.exists():
        return dest
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(dest.suffix + ".partial")
    try:
        print(f"downloading {url} -> {dest}")
        urllib.request.urlretrieve(url, tmp)
        tmp.rename(dest)
    except BaseException:
        if tmp.exists():
            tmp.unlink()
        raise
    return dest


def extract_archive(archive_path, out_dir) -> Path:
    """Extract a .tar[.gz|.bz2] or .zip archive."""
    archive_path, out_dir = Path(archive_path), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    name = archive_path.name
    if name.endswith(".zip"):
        with zipfile.ZipFile(archive_path) as zf:
            zf.extractall(out_dir)
    elif ".tar" in name or name.endswith((".tgz", ".tbz2")):
        with tarfile.open(archive_path) as tf:
            tf.extractall(out_dir)
    else:
        raise ValueError(f"unknown archive format: {name}")
    return out_dir
