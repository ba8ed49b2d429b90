"""Persistent XLA compilation cache setup.

First compiles of the larger jitted graphs (fused train step, GAN step, batched
synthesis) take minutes on TPU; the persistent cache makes every later process start
near-instant. Called by every CLI entry point and the benchmark harness.
"""

import os


def enable_compilation_cache(path: str = None):
    import jax

    path = path or os.environ.get(
        "MATCHA_XLA_CACHE", os.path.expanduser("~/.cache/matcha_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags: non-fatal
