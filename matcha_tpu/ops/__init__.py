"""Hot ops: monotonic alignment search (Pallas/JAX/C++), masks, alignment paths."""

import jax

from matcha_tpu.ops.masks import (
    denormalize,
    duration_loss,
    fix_len_compatibility,
    generate_path,
    normalize,
    sequence_mask,
)
from matcha_tpu.ops.mas_pallas import maximum_path_pallas
from matcha_tpu.ops.mas_ref import maximum_path_ref

__all__ = [
    "maximum_path",
    "maximum_path_pallas",
    "maximum_path_ref",
    "sequence_mask",
    "generate_path",
    "fix_len_compatibility",
    "duration_loss",
    "normalize",
    "denormalize",
]


def maximum_path(value, mask, impl: str = "auto", t_x=None, t_y=None):
    """Batch monotonic alignment search.

    impl: 'auto' (Pallas on TPU, scan elsewhere), 'pallas', 'ref', or 'cpp'.
    t_x/t_y: optional (B,) masked lengths — callers that have them (the training
    loss does) should pass them; see maximum_path_pallas for the measured
    XLA fused-graph reduction miscompile this sidesteps.

    Precondition (all impls): per sample, the masked mel length must be >= the masked
    text length (`t_y >= t_x`) — a monotonic path where every token claims >= 1 frame
    cannot exist otherwise and the DP backtrack silently degenerates. The data
    pipeline enforces this at collate time (matcha_tpu/data/dataset.py::collate);
    callers feeding hand-built masks must uphold it themselves.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "ref"
    if impl == "pallas":
        return maximum_path_pallas(value, mask, t_x=t_x, t_y=t_y)
    if impl == "ref":
        return maximum_path_ref(value, mask)
    if impl == "cpp":
        import numpy as np

        from matcha_tpu.ops.mas_cpp import maximum_path_cpp

        return maximum_path_cpp(np.asarray(value), np.asarray(mask))
    raise ValueError(f"unknown MAS impl: {impl}")
