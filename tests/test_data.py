"""Data pipeline tests: collate shapes, bucketing, per-host sharding, split generation."""

import numpy as np

from matcha_tpu.data.dataset import (
    DataConfig,
    SyntheticDataset,
    batch_iterator,
    collate,
    num_batches,
)
from matcha_tpu.data.ljspeech import process_csv


def test_collate_static_shapes():
    ds = SyntheticDataset(n_items=8, min_frames=50, max_frames=120)
    cfg = DataConfig(batch_size=4, text_pad_multiple=16, mel_pad_multiple=32)
    batch = collate([ds.get(i) for i in range(4)], cfg)
    assert batch["x"].dtype == np.int32
    assert batch["y"].dtype == np.float32
    assert batch["x"].shape[1] % 16 == 0
    assert batch["y"].shape[1] % 4 == 0  # U-Net downsampling requirement
    assert (batch["x_lengths"] <= batch["x"].shape[1]).all()
    assert (batch["y_lengths"] <= batch["y"].shape[1]).all()
    # padding is zeros
    for i in range(4):
        assert batch["x"][i, batch["x_lengths"][i]:].sum() == 0
        assert np.abs(batch["y"][i, batch["y_lengths"][i]:, :]).sum() == 0


def test_collate_rejects_text_longer_than_mel():
    """MAS precondition guard: mel_frames >= text_tokens per sample."""
    import pytest

    cfg = DataConfig(batch_size=2)
    good = {"x": np.arange(10, dtype=np.int32), "y": np.zeros((50, 80), np.float32)}
    bad = {"x": np.arange(30, dtype=np.int32), "y": np.zeros((20, 80), np.float32)}
    with pytest.raises(ValueError, match="monotonic alignment"):
        collate([good, bad], cfg)
    collate([good, good], cfg)  # valid batch still passes


def test_batch_iterator_covers_dataset_and_buckets():
    ds = SyntheticDataset(n_items=64, min_frames=40, max_frames=300)
    cfg = DataConfig(batch_size=8, shuffle_seed=3)
    batches = list(batch_iterator(ds, cfg, epoch=0))
    assert len(batches) == 8
    # bucketing: within-batch length spread should be far below global spread
    spreads = [b["y_lengths"].max() - b["y_lengths"].min() for b in batches]
    glob = max(ds.mel_length(i) for i in range(64)) - min(ds.mel_length(i) for i in range(64))
    assert np.mean(spreads) < glob * 0.55


def test_batch_iterator_epoch_reshuffles():
    ds = SyntheticDataset(n_items=32)
    cfg = DataConfig(batch_size=4)
    b0 = next(iter(batch_iterator(ds, cfg, epoch=0)))
    b1 = next(iter(batch_iterator(ds, cfg, epoch=1)))
    assert not np.array_equal(b0["x_lengths"], b1["x_lengths"]) or not np.array_equal(
        b0["y_lengths"], b1["y_lengths"]
    )


def test_per_host_sharding_disjoint():
    ds = SyntheticDataset(n_items=40)
    cfg = DataConfig(batch_size=4)
    seen = []
    for pi in range(2):
        for b in batch_iterator(ds, cfg, epoch=0, process_index=pi, process_count=2,
                                shuffle=False, drop_last=False):
            seen.append((pi, b["y_lengths"].tolist()))
    lens0 = [l for pi, ls in seen if pi == 0 for l in ls]
    lens1 = [l for pi, ls in seen if pi == 1 for l in ls]
    assert len(lens0) + len(lens1) == 40


def test_process_csv_split(tmp_path):
    base = tmp_path / "LJSpeech-1.1"
    (base / "wavs").mkdir(parents=True)
    with open(base / "metadata.csv", "w") as f:
        for i in range(100):
            f.write(f"LJ{i:03d}|raw text {i}|normalized text {i}\n")
    n_train, n_val = process_csv(base)
    assert n_train + n_val == 100
    assert n_train > 90
    lines = (base / "train.txt").read_text().strip().split("\n")
    path, text = lines[0].split("|")
    assert path.endswith(".wav") and "wavs" in path
    assert text.startswith("raw text")
    # deterministic split
    n2 = process_csv(base)
    assert n2 == (n_train, n_val)


def test_wav_num_samples_header_parse(tmp_path):
    """RIFF parser: exact per-channel sample counts for int16 AND float32 wavs
    (the old fixed-44-byte 16-bit assumption was 2x off for float32)."""
    from scipy.io import wavfile

    from matcha_tpu.data.dataset import _wav_num_samples

    n = 12345
    y16 = (np.sin(np.arange(n) * 0.01) * 20000).astype(np.int16)
    wavfile.write(tmp_path / "i16.wav", 22050, y16)
    assert _wav_num_samples(tmp_path / "i16.wav") == n

    yf = np.sin(np.arange(n) * 0.01).astype(np.float32)
    wavfile.write(tmp_path / "f32.wav", 22050, yf)  # scipy adds a 'fact' chunk
    assert _wav_num_samples(tmp_path / "f32.wav") == n


def test_textmel_dataset_real_wavs(tmp_path):
    """TextMelDataset end-to-end on real wav files: header mel_length must equal the
    actual computed mel length (multi-host schedules depend on this), the mel cache
    round-trips, and the 2-host batch schedule agrees on shapes."""
    from scipy.io import wavfile

    from matcha_tpu.data.dataset import TextMelDataset, batch_iterator

    rng = np.random.default_rng(0)
    meta = tmp_path / "train.txt"
    texts = ["hello world", "the quick brown fox", "testing one two three",
             "flow matching", "mel spectrogram cache", "monotonic alignment"]
    with open(meta, "w") as f:
        for i, text in enumerate(texts):
            n = int(rng.integers(22050, 44100))
            y = (np.sin(np.arange(n) * 0.03) * 15000).astype(np.int16)
            path = tmp_path / f"w{i}.wav"
            wavfile.write(path, 22050, y)
            f.write(f"{path}|{text}\n")

    ds = TextMelDataset(meta)
    assert len(ds) == 6
    for i in range(6):
        item = ds.get(i)
        assert ds.mel_length(i) == item["y"].shape[0], "header estimate must be exact"
        assert ds.text_length(i) == len(item["x"])
    # cache round-trip: second read hits .npy and matches
    cached = ds.get(0)["y"]
    assert len(list(ds.cache_dir.glob("*.npy"))) == 6
    np.testing.assert_array_equal(cached, ds.get(0)["y"])

    # 2-host schedule: same batch count, identical static shapes per batch
    cfg = DataConfig(batch_size=1, text_pad_multiple=16, mel_pad_multiple=16)
    shapes = []
    for pi in range(2):
        shapes.append([
            (b["x"].shape, b["y"].shape[1])
            for b in batch_iterator(ds, cfg, epoch=0, process_index=pi,
                                    process_count=2, drop_last=False)
        ])
    assert len(shapes[0]) == len(shapes[1]) == 3
    assert [s[1] for s in shapes[0]] == [s[1] for s in shapes[1]]


def test_num_batches_matches_iterator_exactly():
    """The lr schedule's steps_per_epoch must equal the iterator's REAL batch count.

    Covers the drop_last remainder case the naive `n // batch` formula gets wrong:
    remainders are dropped PER sort window (window = global_bs * 16), so a dataset
    spanning several windows can lose more than one partial batch per epoch.
    """
    cfg = DataConfig(batch_size=4)
    # n values chosen to hit: exact multiple, sub-window remainder, multi-window
    # with per-window remainders, single short window
    for n in (16, 17, 63, 64, 65, 130, 3):
        ds = SyntheticDataset(n_items=n, min_frames=40, max_frames=120)
        for process_count in (1, 2):
            if n < cfg.batch_size * process_count:
                continue
            for drop_last in (True, False):
                got = sum(
                    1 for _ in batch_iterator(
                        ds, cfg, epoch=1, process_count=process_count,
                        drop_last=drop_last,
                    )
                )
                want = num_batches(n, cfg, process_count, drop_last=drop_last)
                assert got == want, (n, process_count, drop_last, got, want)
