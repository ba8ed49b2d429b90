"""MAS kernel benchmark CLI.

Counterpart of `/root/reference/test_monotonic_align_speed.py`: times the Pallas MAS
kernel against the C++/OpenMP CPU reference and the pure-JAX scan on the reference's
benchmark shapes, asserting path equality along the way.

Usage:
    python -m matcha_tpu.cli.bench_mas
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference shapes (`test_monotonic_align_speed.py:126-130`)
SHAPES = [(8, 50, 200), (16, 100, 500), (32, 150, 800)]
RUNS = 20


def make_problem(b, tx, ty, seed=0):
    rng = np.random.default_rng(seed)
    value = rng.standard_normal((b, tx, ty)).astype(np.float32)
    t_x = rng.integers(max(tx // 2, 1), tx + 1, size=b)
    t_y = np.maximum(rng.integers(max(ty // 2, 1), ty + 1, size=b), t_x)
    x_mask = (np.arange(tx)[None] < t_x[:, None]).astype(np.float32)
    y_mask = (np.arange(ty)[None] < t_y[:, None]).astype(np.float32)
    return value, x_mask[:, :, None] * y_mask[:, None, :]


def main():
    from matcha_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from matcha_tpu.ops import maximum_path_pallas, maximum_path_ref
    from matcha_tpu.ops.mas_cpp import maximum_path_cpp

    print(f"backend: {jax.default_backend()}, {RUNS} runs per shape")
    print(f"{'shape':>18} {'pallas_ms':>10} {'scan_ms':>10} {'cpp_ms':>10} {'pallas_vs_cpp':>14}")
    for b, tx, ty in SHAPES:
        value, mask = make_problem(b, tx, ty)
        jv, jm = jnp.asarray(value), jnp.asarray(mask)

        p = np.asarray(maximum_path_pallas(jv, jm))  # compile
        r = np.asarray(maximum_path_ref(jv, jm))
        c = maximum_path_cpp(value, mask)
        np.testing.assert_array_equal(p, c)
        np.testing.assert_array_equal(r, c)

        def timeit(fn):
            t0 = time.perf_counter()
            for _ in range(RUNS):
                jax.block_until_ready(fn()) if hasattr(fn(), "block_until_ready") else fn()
            return (time.perf_counter() - t0) / RUNS * 1e3

        t_pal = timeit(lambda: maximum_path_pallas(jv, jm))
        t_ref = timeit(lambda: maximum_path_ref(jv, jm))
        t_cpp = timeit(lambda: maximum_path_cpp(value, mask))
        print(f"{(b, tx, ty)!s:>18} {t_pal:>10.2f} {t_ref:>10.2f} {t_cpp:>10.2f} "
              f"{t_cpp / t_pal:>13.2f}x")


if __name__ == "__main__":
    main()
