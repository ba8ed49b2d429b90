"""Visualization helpers (spectrogram/alignment rendering for logs and CLI output).

Counterpart of `/root/reference/matcha/utils/utils.py`: render a (C, T) or (T, C)
array to an RGB numpy image for TensorBoard, or save a dB-scaled mel PNG like
`generate.py:111-153`.
"""

import numpy as np


def plot_tensor(tensor) -> np.ndarray:
    """(C, T) array -> (H, W, 3) uint8 RGB image for TensorBoard.

    Backend note: figures here are rendered off-screen via the canvas buffer and
    closed before returning; no global `matplotlib.use(...)` switch is performed
    (modern matplotlib falls back to Agg by itself on headless hosts, and forcing
    it would silently break inline rendering in notebooks).
    """
    import matplotlib.pyplot as plt

    arr = np.asarray(tensor)
    if arr.ndim == 3:
        arr = arr[0]
    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(arr, aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.tight_layout()
    fig.canvas.draw()
    buf = fig.canvas.buffer_rgba()
    w, h = fig.canvas.get_width_height()
    data = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 4)[:, :, :3].copy()
    plt.close(fig)
    return data


def plot_spectrogram(spectrogram):
    """(C, T) array -> matplotlib Figure (mirrors `utils/utils.py:10-26`).

    The caller owns the returned Figure and must `plt.close(fig)` after use
    (e.g. in a logging loop) to avoid accumulating open figures.
    """
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(np.asarray(spectrogram), aspect="auto", origin="lower",
                   interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.xlabel("Frames")
    plt.ylabel("Channels")
    plt.tight_layout()
    fig.canvas.draw()
    return fig


def save_mel_png(log_mel, path, title="Mel Spectrogram"):
    """Save a dB-scaled mel image (mirrors `generate.py:125-152`)."""
    import matplotlib.pyplot as plt

    data = np.asarray(log_mel)
    if data.ndim == 3:
        data = data[0]
    if data.min() < 0:  # log-mel -> linear
        data = np.exp(data)
    db = 20 * np.log10(data + 1e-10)
    vmin, vmax = np.percentile(db, 1), np.percentile(db, 99)
    if vmax < -10:
        vmax = db.max()
    plt.figure(figsize=(12, 6))
    img = plt.imshow(db, origin="lower", aspect="auto", cmap="viridis",
                     vmin=vmin, vmax=vmax, interpolation="bilinear")
    plt.title(title)
    plt.xlabel("Time (frames)")
    plt.ylabel("Mel bins")
    plt.colorbar(img, label="dB")
    plt.tight_layout()
    plt.savefig(path, dpi=150, bbox_inches="tight")
    plt.close()
