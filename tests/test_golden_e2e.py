"""Frozen FULL-SIZE end-to-end synthesise parity (no torch at test time).

The fixture (tests/fixtures/golden_e2e.npz, generated once by
tests/make_golden_e2e.py) freezes the torch oracle's complete inference chain —
durations -> ceil -> generate_path -> mu_y -> Euler ODE
(`/root/reference/matcha/models/matcha_tts.py:179-245`,
`flow_matching.py:67-104`) — at the DEFAULT reference hyperparameters. Unlike
tests/test_e2e_parity.py (live oracle), the expected outputs here cannot co-drift
with an edited oracle; unlike tests/test_golden_parity.py (reduced widths), this
pins conversion + composition at the full shipped configuration, covering
width-sensitive mistakes (head_dim splits, fan-in layouts).

Weights are regenerated from the frozen (key, shape) spec via the deterministic
numpy streams in tests/golden_utils.py.
"""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from tests.golden_utils import synth_state_dict

FIXDIR = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module", params=["golden_e2e.npz", "golden_e2e_midpoint.npz"])
def fx(request):
    path = FIXDIR / request.param
    if not path.exists():
        pytest.skip("golden e2e fixture missing — run python -m tests.make_golden_e2e")
    return np.load(path)


def test_full_size_synthesise_matches_golden(fx):
    from matcha_tpu.compat.torch_import import convert_matcha_state_dict
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS

    spec = {k[len("spec/"):]: tuple(fx[k]) for k in fx.files if k.startswith("spec/")}
    params = convert_matcha_state_dict(synth_state_dict(spec))

    solver = str(fx["solver"]) if "solver" in fx.files else "euler"
    model = MatchaTTS(MatchaConfig(solver=solver))
    out = model.apply(
        {"params": params},
        jnp.asarray(fx["x"], jnp.int32), jnp.asarray(fx["xl"], jnp.int32),
        int(fx["y_max_length"]), int(fx["n_timesteps"]),
        float(fx["temperature"]), float(fx["length_scale"]),
        method=MatchaTTS.synthesise_fixed,
        z=jnp.asarray(fx["z"].transpose(0, 2, 1)),
    )

    np.testing.assert_array_equal(np.asarray(out["mel_lengths"]), fx["mel_lengths"])
    np.testing.assert_array_equal(np.asarray(out["attn"]), fx["attn"])

    t_pad = fx["mel_masked"].shape[-1]
    mask = (np.arange(t_pad)[None, None, :] < fx["mel_lengths"][:, None, None]
            ).astype(np.float32)
    mu_y = np.asarray(out["encoder_outputs"]).transpose(0, 2, 1)
    np.testing.assert_allclose(mu_y * mask, fx["mu_y_masked"], atol=5e-4)
    mel = np.asarray(out["mel"]).transpose(0, 2, 1)
    np.testing.assert_allclose(mel * mask, fx["mel_masked"], atol=1e-3)
