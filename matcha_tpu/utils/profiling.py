"""Profiling and timing utilities.

The reference has no tracing/profiling beyond ad-hoc RTF wall-clock timing
(`matcha_tts.py:214,235-236`); this module is the TPU-native observability layer
(SURVEY.md §5): jax.profiler trace capture around arbitrary code regions, a step timer
that understands asynchronous dispatch, and the RTF metric.
"""

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto.

    Usage:
        with trace("/tmp/jax_trace"):
            run_step(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def synchronize(tree):
    """Ensure device work producing `tree` has finished.

    Forces a scalar device->host transfer: plain `block_until_ready` does not
    synchronize through remote-device tunnels (e.g. axon), a transfer always does.
    """
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        float(jnp.sum(leaves[0]).astype(jnp.float32))
    return tree


class StepTimer:
    """Wall-clock timer for jitted steps with async-dispatch-safe synchronization."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        out = {}
        yield out
        if "result" in out:
            synchronize(out["result"])
        self.times.append(time.perf_counter() - t0)

    @property
    def median(self):
        s = sorted(self.times)
        return s[len(s) // 2] if s else float("nan")


def rtf(wall_seconds: float, mel_frames: int, hop: int = 256, sr: int = 22050) -> float:
    """Real-time factor as the reference computes it (`matcha_tts.py:235-236`)."""
    return wall_seconds * sr / (mel_frames * hop)
