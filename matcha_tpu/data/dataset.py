"""Text+mel training data pipeline (numpy host side, static-shape batches).

TPU-native replacement for the reference Dataset/DataModule
(`/root/reference/matcha/data_management/`): the reference tokenizes and re-computes
every mel on the fly per epoch in the DataLoader process (`ljspeechDataset.py:21-36`,
with `num_workers` forced to 0). Here:

  * mels are computed once with the jitted JAX pipeline and cached to disk (.npy);
  * batches are BUCKETED BY LENGTH and padded to static (Tx, Ty) shapes — Ty a multiple
    of 2**decoder-downsamples — so XLA compiles a handful of shapes instead of one per
    batch;
  * per-host sharding for data-parallel training slices the example list by
    `process_index` before batching.

Tokenization matches the reference training path exactly: `english_cleaners` then
char->id, no EOS (`ljspeechDataset.py:25-26`).

A `SyntheticDataset` with the same interface provides deterministic speech-shaped data
for tests and benchmarks when LJSpeech is not on disk.
"""

import hashlib
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from matcha_tpu.audio.mel import MelConfig, load_wav, num_frames
from matcha_tpu.ops.masks import fix_len_compatibility
from matcha_tpu.text import train_text_to_sequence


@dataclass(frozen=True)
class DataConfig:
    batch_size: int = 16
    text_pad_multiple: int = 32
    mel_pad_multiple: int = 64  # multiple of 4 (U-Net) and VPU-friendly
    max_text_len: int = 256
    max_mel_len: int = 1024
    shuffle_seed: int = 0


def _wav_num_samples(path) -> int:
    """Per-channel sample count from the RIFF header (no audio decode).

    Walks the chunk list properly (fmt_ for bit depth / channel count, data for
    payload size) instead of assuming a fixed 44-byte 16-bit-PCM header, so float32
    wavs and files with extra chunks (LIST, fact, ...) are measured exactly.
    """
    import struct

    with open(path, "rb") as f:
        riff = f.read(12)
        if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        block_align = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            if cid == b"fmt ":
                fmt = f.read(size + (size & 1))
                block_align = struct.unpack("<H", fmt[12:14])[0]  # channels*bits/8
            elif cid == b"data":
                if not block_align:
                    raise ValueError(f"{path}: data chunk before fmt chunk")
                return max(size // block_align, 1)
            else:
                f.seek(size + (size & 1), os.SEEK_CUR)
    raise ValueError(f"{path}: no data chunk found")


class TextMelDataset:
    """metadata file of `wav_path|text` lines -> tokenized text + cached log-mel."""

    def __init__(self, metadata_path, mel_cfg: MelConfig = MelConfig(), cache_dir=None):
        self.mel_cfg = mel_cfg
        self.items: List[Tuple[str, str]] = []
        with open(metadata_path, encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split("|")
                if len(parts) >= 2:
                    self.items.append((parts[0], parts[1]))
        if cache_dir is None:
            cache_dir = Path(metadata_path).parent / "mel_cache"
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self._mel_fn = None

    def __len__(self):
        return len(self.items)

    def _cache_path(self, wav_path: str) -> Path:
        key = hashlib.sha1(wav_path.encode()).hexdigest()[:16]
        return self.cache_dir / f"{Path(wav_path).stem}_{key}.npy"

    def _compute_mel(self, wav_path: str) -> np.ndarray:
        if self._mel_fn is None:
            from matcha_tpu.audio.mel import mel_spectrogram

            self._mel_fn = mel_spectrogram
        y, _ = load_wav(wav_path)
        mel = np.asarray(self._mel_fn(self.mel_cfg, y[None, :]))[0]  # (n_mels, T)
        return mel.T.astype(np.float32)  # (T, n_mels) feature-last

    def get(self, idx: int) -> dict:
        wav_path, text = self.items[idx]
        cache = self._cache_path(wav_path)
        if cache.exists():
            mel = np.load(cache)
        else:
            mel = self._compute_mel(wav_path)
            np.save(cache, mel)
        ids = np.asarray(train_text_to_sequence(text), dtype=np.int32)
        return {"x": ids, "y": mel}

    def mel_length(self, idx: int) -> int:
        """Mel frame count without decoding audio, from the RIFF header.

        MUST be a pure function of the wav file (never of per-host cache state):
        multi-host batch scheduling derives the GLOBAL static pad shapes from these
        values, and hosts only populate the mel cache for their own slice — a
        cache-dependent answer would make hosts disagree on compiled shapes and
        deadlock the collectives.
        """
        return num_frames(self.mel_cfg, _wav_num_samples(self.items[idx][0]))

    def text_length(self, idx: int) -> int:
        """Token count without touching audio (cheap: tokenization only)."""
        return len(train_text_to_sequence(self.items[idx][1]))


class SyntheticDataset:
    """Deterministic speech-shaped data with the TextMelDataset interface."""

    _SENTENCES = [
        "the quick brown fox jumps over the lazy dog",
        "hello world this is a synthetic matcha sample",
        "flow matching makes text to speech fast",
        "tensor processing units chew through matmuls",
        "monotonic alignment search runs on chip now",
    ]

    def __init__(self, n_items: int = 64, mel_cfg: MelConfig = MelConfig(), seed: int = 0,
                 min_frames: int = 80, max_frames: int = 400):
        self.mel_cfg = mel_cfg
        self.n_items = n_items
        self.seed = seed
        self.min_frames = min_frames
        self.max_frames = max_frames

    def __len__(self):
        return self.n_items

    def mel_length(self, idx: int) -> int:
        rng = np.random.default_rng(self.seed * 100003 + idx)
        return int(rng.integers(self.min_frames, self.max_frames + 1))

    def text_length(self, idx: int) -> int:
        text = self._SENTENCES[idx % len(self._SENTENCES)]
        return min(len(train_text_to_sequence(text)), self.mel_length(idx))

    def get(self, idx: int) -> dict:
        rng = np.random.default_rng(self.seed * 100003 + idx)
        t = int(rng.integers(self.min_frames, self.max_frames + 1))
        text = self._SENTENCES[idx % len(self._SENTENCES)]
        # crop text to <= mel frames so every example satisfies the MAS
        # precondition (mel_frames >= text_tokens) at any min_frames setting
        ids = np.asarray(train_text_to_sequence(text), dtype=np.int32)[:t]
        # smooth low-rank "mel": random walk over time x fixed spectral envelopes
        k = 6
        env = rng.standard_normal((k, self.mel_cfg.n_mels)).astype(np.float32)
        coef = np.cumsum(0.3 * rng.standard_normal((t, k)).astype(np.float32), axis=0)
        mel = np.tanh(coef @ env) * 2.0 - 5.0
        return {"x": ids, "y": mel.astype(np.float32)}


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def pad_shapes(cfg: DataConfig, max_text: int, max_mel: int) -> Tuple[int, int]:
    """(Tx, Ty) static pad shapes for a batch with the given raw max lengths."""
    tx = min(_round_up(max_text, cfg.text_pad_multiple), cfg.max_text_len)
    ty_raw = min(_round_up(max_mel, cfg.mel_pad_multiple), cfg.max_mel_len)
    return tx, fix_len_compatibility(ty_raw)


def collate(items: List[dict], cfg: DataConfig, shape: Optional[Tuple[int, int]] = None) -> dict:
    """Pad a list of examples to static bucketed shapes.

    `shape`: optional explicit (Tx, Ty) pad shape. Multi-host training passes the
    GLOBAL batch's shape here so every process collates to identical static shapes
    (a prerequisite for assembling per-host shards into one global array — different
    shapes would mean different compiled graphs per host and a collective deadlock).

    Guards the MAS precondition `mel_frames >= text_tokens` per sample: a monotonic
    alignment in which every token claims at least one frame cannot exist otherwise,
    and every MAS implementation would silently produce a garbage path (the reference
    has the same latent flaw, unguarded — `monotonic_align/__init__.py:40`).
    """
    xs = [it["x"][: cfg.max_text_len] for it in items]
    ys = [it["y"][: cfg.max_mel_len] for it in items]
    for i, (xi, yi) in enumerate(zip(xs, ys)):
        if yi.shape[0] < len(xi):
            raise ValueError(
                f"sample {i}: mel has {yi.shape[0]} frames but text has {len(xi)} "
                "tokens; monotonic alignment requires mel_frames >= text_tokens "
                "(filter or re-crop the example)"
            )
    if shape is None:
        shape = pad_shapes(cfg, max(len(x) for x in xs), max(y.shape[0] for y in ys))
    tx, ty = shape
    n_mels = ys[0].shape[1]

    b = len(items)
    x = np.zeros((b, tx), np.int32)
    y = np.zeros((b, ty, n_mels), np.float32)
    xl = np.zeros((b,), np.int32)
    yl = np.zeros((b,), np.int32)
    for i, (xi, yi) in enumerate(zip(xs, ys)):
        lx, ly = min(len(xi), tx), min(yi.shape[0], ty)
        x[i, :lx] = xi[:lx]
        y[i, :ly] = yi[:ly]
        xl[i] = lx
        yl[i] = ly
    return {"x": x, "x_lengths": xl, "y": y, "y_lengths": yl}


def num_batches(n_items: int, cfg: DataConfig, process_count: int = 1,
                drop_last: bool = True) -> int:
    """Exact per-epoch batch count of `batch_iterator` for a dataset of n_items.

    The iterator's schedule is deterministic: items are cut into sort windows of
    `global_bs * 16`, each window yields `len // global_bs` full batches plus (when
    drop_last=False) one wrap-padded remainder batch. Independent of the shuffle
    permutation. The lr schedule derives steps_per_epoch from THIS (not the naive
    `n // batch` which ignores per-window remainder drops) so the per-epoch cosine
    boundary lands exactly on the iterator's epoch boundary — the reference uses a
    per-epoch torch CosineAnnealingLR (`baselightningmodule.py:60-92`).
    """
    global_bs = cfg.batch_size * process_count
    window = global_bs * 16
    total = 0
    for start in range(0, n_items, window):
        chunk = min(window, n_items - start)
        total += chunk // global_bs
        if not drop_last and chunk % global_bs:
            total += 1
    return total


def batch_iterator(
    dataset,
    cfg: DataConfig,
    epoch: int = 0,
    shuffle: bool = True,
    process_index: int = 0,
    process_count: int = 1,
    drop_last: bool = True,
) -> Iterator[dict]:
    """Length-bucketed batches padded to static shapes; globally synchronized.

    Multi-host design: every process computes the SAME global batch schedule (same
    seed -> same permutation -> same buckets of `batch_size * process_count` items,
    same static pad shapes from index-only length metadata), then loads only its own
    `[process_index::process_count]` slice of each batch. Every host therefore steps
    through identical batch counts and identical compiled shapes — the per-batch loss
    under SPMD is a *global* value, so logged/ranked val metrics agree on all hosts
    (the reference's `sync_dist=True` intent, `baselightningmodule.py:123-202`).

    Examples are shuffled, sorted into length-similar pools so each batch pads to a
    tight bucket (bounded padded-FLOP waste), then batch order is shuffled. With
    `drop_last=False` the final short batch is wrap-padded by cycling its own items
    so shapes stay static (standard eval-padding); its `n_real` key reports the
    distinct-item count so validation can weight the batch mean correctly.
    """
    n = len(dataset)
    global_bs = cfg.batch_size * process_count
    rng = np.random.default_rng(cfg.shuffle_seed * 1_000_003 + epoch)
    order = rng.permutation(n) if shuffle else np.arange(n)

    # Length metadata for ALL items, computed ONCE per epoch (index-only, no audio
    # decode). Everything the schedule derives from these (bucketing, static pad
    # shapes, the MAS-precondition check) is therefore identical on every host.
    mel_lens = np.empty(n, np.int64)
    text_lens = np.empty(n, np.int64)
    for i in order:
        mel_lens[i] = dataset.mel_length(int(i))
        text_lens[i] = dataset.text_length(int(i))
    # MAS precondition, raised on EVERY host alike (a per-host raise inside collate
    # would leave the other hosts blocked in collectives — multi-host data errors
    # must fail synchronously). Crop-to-max shortens both sides consistently.
    eff_text = np.minimum(text_lens, cfg.max_text_len)
    eff_mel = np.minimum(mel_lens, cfg.max_mel_len)
    bad = np.nonzero(eff_text > eff_mel)[0]
    if bad.size:
        raise ValueError(
            f"dataset items {bad[:8].tolist()}...: text tokens exceed mel frames; "
            "monotonic alignment requires mel_frames >= text_tokens per sample "
            "(filter or re-crop these examples)"
        )

    # sort by mel length within a window to build tight buckets
    window = global_bs * 16
    buckets = []
    for start in range(0, len(order), window):
        chunk = order[start : start + window]
        chunk = chunk[np.argsort(mel_lens[chunk], kind="stable")]
        for bstart in range(0, len(chunk), global_bs):
            batch_idx = chunk[bstart : bstart + global_bs]
            n_real = len(batch_idx)
            if n_real < global_bs:
                if drop_last:
                    continue
                reps = -(-global_bs // n_real)  # wrap-pad by cycling
                batch_idx = np.tile(batch_idx, reps)[:global_bs]
            buckets.append((batch_idx, n_real))
    if shuffle:
        rng.shuffle(buckets)
    for batch_idx, n_real in buckets:
        # static shape from the GLOBAL batch (identical on every host)
        shape = pad_shapes(cfg, int(text_lens[batch_idx].max()),
                           int(mel_lens[batch_idx].max()))
        local_idx = batch_idx[process_index::process_count]
        batch = collate([dataset.get(int(i)) for i in local_idx], cfg, shape=shape)
        batch["n_real"] = n_real
        yield batch
