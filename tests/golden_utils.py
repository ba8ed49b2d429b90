"""Deterministic numpy weight synthesis shared by the golden-e2e fixture maker
(tests/make_golden_e2e.py, torch required) and its torch-free consumer test
(tests/test_golden_e2e.py).

Freezing a FULL-SIZE (18M-param) state dict into the repo would cost ~70 MB of
incompressible float noise; instead the fixture freezes only the (key, shape)
spec plus a seed, and both sides regenerate identical weights via numpy's
stability-guaranteed PCG64 stream (NEP 19). The fixture's frozen *outputs* are
what pins the semantics — any drift in weight synthesis, conversion, or the
model forward fails the comparison.
"""

import numpy as np

GOLDEN_E2E_SEED = 20260820


def synth_state_dict(spec, seed=GOLDEN_E2E_SEED):
    """spec: {torch_state_dict_key: shape tuple} -> {key: float32 ndarray}.

    Per-key independent streams (seeded by sorted-key index) so the result does
    not depend on dict ordering. Value ranges keep full-size activations sane:
    norm gammas near 1, biases near 0, weights fan-in scaled. The duration
    predictor's output bias is offset so exp(logw) lands near 2 frames/token —
    a non-trivial alignment path for the e2e chain.
    """
    out = {}
    for idx, key in enumerate(sorted(spec)):
        shape = tuple(int(s) for s in spec[key])
        rng = np.random.default_rng([seed, idx])
        n = rng.standard_normal(shape).astype(np.float32)
        if len(shape) == 1:
            if key.endswith(".weight"):  # LayerNorm/GroupNorm gamma
                arr = 1.0 + 0.05 * n
            elif "duration_predictor.output_projection" in key:
                arr = 0.7 + 0.02 * n
            else:  # bias / norm beta
                arr = 0.02 * n
        else:
            fan_in = int(np.prod(shape[1:]))
            arr = n / np.sqrt(fan_in)
        out[key] = arr.astype(np.float32)
    return out
