"""MAS cross-validation: JAX scan reference vs C++ CPU reference vs Pallas kernel.

The three implementations must agree path-for-path on randomized banded problems,
including the reference benchmark shapes (`test_monotonic_align_speed.py:126-130`).
"""

import numpy as np
import pytest

from matcha_tpu.ops import maximum_path_pallas, maximum_path_ref
from matcha_tpu.ops.mas_cpp import maximum_path_cpp


def _random_problem(rng, b, tx_max, ty_max):
    value = rng.standard_normal((b, tx_max, ty_max)).astype(np.float32)
    t_x = rng.integers(1, tx_max + 1, size=b)
    t_y = np.maximum(rng.integers(1, ty_max + 1, size=b), t_x)  # need ty >= tx
    x_mask = (np.arange(tx_max)[None, :] < t_x[:, None]).astype(np.float32)
    y_mask = (np.arange(ty_max)[None, :] < t_y[:, None]).astype(np.float32)
    mask = x_mask[:, :, None] * y_mask[:, None, :]
    return value, mask, t_x, t_y


def _check_path_valid(path, t_x, t_y):
    """Structural invariants of a monotone alignment."""
    b = path.shape[0]
    for i in range(b):
        p = path[i, : t_x[i], : t_y[i]]
        # every frame assigned exactly one token
        np.testing.assert_array_equal(p.sum(axis=0), 1)
        # every token gets >= 1 frame
        assert (p.sum(axis=1) >= 1).all()
        # monotone: token index non-decreasing over frames
        tok = p.argmax(axis=0)
        assert (np.diff(tok) >= 0).all()
        assert tok[0] == 0 and tok[-1] == t_x[i] - 1
        # nothing outside the valid region
        assert path[i, t_x[i] :, :].sum() == 0
        assert path[i, :, t_y[i] :].sum() == 0


@pytest.mark.parametrize("b,tx,ty", [(4, 17, 40), (8, 50, 200), (3, 1, 5), (2, 13, 13)])
def test_ref_vs_cpp(b, tx, ty):
    rng = np.random.default_rng(b * 1000 + tx)
    value, mask, t_x, t_y = _random_problem(rng, b, tx, ty)
    ref = np.asarray(maximum_path_ref(value, mask))
    cpp = maximum_path_cpp(value, mask)
    _check_path_valid(ref, t_x, t_y)
    np.testing.assert_array_equal(ref, cpp)


@pytest.mark.parametrize("b,tx,ty", [(4, 17, 40), (8, 50, 200), (2, 13, 13)])
def test_pallas_vs_ref(b, tx, ty):
    rng = np.random.default_rng(b * 7 + ty)
    value, mask, t_x, t_y = _random_problem(rng, b, tx, ty)
    ref = np.asarray(maximum_path_ref(value, mask))
    pal = np.asarray(maximum_path_pallas(value, mask))
    np.testing.assert_array_equal(ref, pal)


def test_pallas_vs_cpp_reference_bench_shape():
    rng = np.random.default_rng(0)
    value, mask, t_x, t_y = _random_problem(rng, 16, 100, 500)
    cpp = maximum_path_cpp(value, mask)
    pal = np.asarray(maximum_path_pallas(value, mask))
    _check_path_valid(cpp, t_x, t_y)
    np.testing.assert_array_equal(cpp, pal)


def test_degenerate_equal_lengths():
    # tx == ty forces the pure diagonal path.
    b, t = 2, 9
    rng = np.random.default_rng(1)
    value = rng.standard_normal((b, t, t)).astype(np.float32)
    mask = np.ones((b, t, t), dtype=np.float32)
    ref = np.asarray(maximum_path_ref(value, mask))
    np.testing.assert_array_equal(ref, np.broadcast_to(np.eye(t, dtype=np.float32), (b, t, t)))


def test_maximum_path_explicit_lengths_match_mask_derived():
    """t_x/t_y passed explicitly == derived from the mask (the training loss
    passes them to sidestep a measured XLA fused-graph reduction miscompile —
    see maximum_path_pallas; both routes must agree in exact semantics)."""
    import jax.numpy as jnp

    from matcha_tpu.ops import maximum_path, maximum_path_pallas

    rng = np.random.default_rng(3)
    b, tx, ty = 6, 24, 48
    t_x = rng.integers(8, tx + 1, size=b)
    t_y = np.maximum(rng.integers(ty // 2, ty + 1, size=b), t_x)
    mask = ((np.arange(tx)[None] < t_x[:, None])[:, :, None]
            * (np.arange(ty)[None] < t_y[:, None])[:, None, :]).astype(np.float32)
    value = rng.standard_normal((b, tx, ty)).astype(np.float32)
    p_derived = np.asarray(maximum_path_pallas(jnp.asarray(value), jnp.asarray(mask)))
    p_explicit = np.asarray(maximum_path_pallas(
        jnp.asarray(value), jnp.asarray(mask),
        t_x=jnp.asarray(t_x), t_y=jnp.asarray(t_y)))
    np.testing.assert_array_equal(p_derived, p_explicit)
    p_disp = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask),
                                     impl="pallas", t_x=jnp.asarray(t_x),
                                     t_y=jnp.asarray(t_y)))
    np.testing.assert_array_equal(p_disp, p_explicit)
