"""End-to-end inference parity: full `synthesise` chain vs the torch oracle.

SURVEY.md §7 build-order step 4's declared milestone: the complete inference path
`encoder -> w=exp(logw) -> ceil -> length_scale -> generate_path -> mu_y -> Euler
ODE -> mel` allclose (atol 1e-3) against reference PyTorch semantics
(`/root/reference/matcha/models/matcha_tts.py:179-245`, Euler loop
`flow_matching.py:67-104`) with identical converted weights and injected noise.

This is the one test where the reference's composed quirks must line up:
length_scale applied AFTER ceil (`matcha_tts.py:219`), `fix_len_compatibility`
mult-of-4 padding (`:222`), duration->path construction (`model.py:77`), and the
re-derived-dt Euler loop. Per-layer parity (tests/test_torch_parity.py) cannot
catch drift in how these compose.

FULL-SIZE model (default reference hyperparameters: 192-ch encoder,
(256,256)-ch U-Net — `matcha_tts.py:123-158`), ragged batch. A frozen full-size
variant lives in tests/test_golden_e2e.py (no torch needed there).
"""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests import torch_ref  # noqa: E402


@pytest.fixture(scope="module")
def full_size_pair():
    torch.manual_seed(7)
    tenc = torch_ref.TorchTextEncoder().eval()
    tdec = torch_ref.TorchDecoder().eval()
    sd = {f"encoder.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}
    sd.update(
        {f"decoder.estimator.{k}": v.detach().numpy() for k, v in tdec.state_dict().items()}
    )
    from matcha_tpu.compat.torch_import import convert_matcha_state_dict

    return tenc, tdec, convert_matcha_state_dict(sd)


@pytest.mark.parametrize(
    "n_timesteps,temperature,length_scale",
    [
        (4, 1.0, 1.0),
        # demo-notebook temperature + non-integer length_scale: exercises the
        # scale-AFTER-ceil quirk producing fractional durations in generate_path
        (6, 0.667, 1.5),
    ],
)
def test_synthesise_e2e_parity(full_size_pair, n_timesteps, temperature, length_scale):
    tenc, tdec, params = full_size_pair
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS

    b, tx = 2, 20
    rng = np.random.default_rng(42)
    x = rng.integers(3, 140, size=(b, tx)).astype(np.int64)
    xl = np.array([20, 13])
    x[1, 13:] = 0  # padding ids beyond length

    # derive the padded frame budget the reference would pick, then inject noise
    xt, xlt = torch.from_numpy(x), torch.from_numpy(xl)
    with torch.no_grad():
        _, logw, x_mask = tenc(xt, xlt)
    w_ceil = torch.ceil(torch.exp(logw) * x_mask) * length_scale
    y_lengths = torch.clamp_min(torch.sum(w_ceil, [1, 2]), 1).long()
    y_max_length_ = torch_ref.torch_fix_len_compatibility(int(y_lengths.max()))
    z = rng.standard_normal((b, 80, y_max_length_)).astype(np.float32)

    out_t = torch_ref.torch_synthesise(
        tenc, tdec, xt, xlt, n_timesteps, torch.from_numpy(z),
        temperature=temperature, length_scale=length_scale, y_max_length_=y_max_length_,
    )

    model = MatchaTTS(MatchaConfig())
    out_j = model.apply(
        {"params": params},
        jnp.asarray(x, jnp.int32), jnp.asarray(xl, jnp.int32),
        y_max_length_, n_timesteps, temperature, length_scale,
        method=MatchaTTS.synthesise_fixed,
        z=jnp.asarray(z.transpose(0, 2, 1)),
    )

    # frame totals and the 0/1 alignment path must agree exactly
    np.testing.assert_array_equal(np.asarray(out_j["mel_lengths"]),
                                  out_t["mel_lengths"].numpy())
    np.testing.assert_array_equal(np.asarray(out_j["attn"]), out_t["attn"].numpy())

    mask = out_t["y_mask"].numpy()  # (B, 1, T): reference never masks the padded
    # frames of the running ODE state (they hold raw noise), the JAX side zeroes
    # them — compare masked
    mu_y_j = np.asarray(out_j["encoder_outputs"]).transpose(0, 2, 1)
    np.testing.assert_allclose(mu_y_j * mask, out_t["encoder_outputs"].numpy() * mask,
                               atol=5e-4)
    mel_j = np.asarray(out_j["mel"]).transpose(0, 2, 1)
    np.testing.assert_allclose(mel_j * mask, out_t["decoder_outputs"].numpy() * mask,
                               atol=1e-3)


def test_injected_z_matches_rng_path():
    """`z=` injection is exactly the rng sampling path given the same noise."""
    from matcha_tpu.flow import sample_cfm

    key = jax.random.PRNGKey(9)
    rng = np.random.default_rng(3)
    mu = jnp.asarray(rng.standard_normal((2, 12, 8)), jnp.float32)
    mask = jnp.ones((2, 12, 1), jnp.float32)
    estimator = lambda x, m, mu_, t: (mu_ - x) * m

    out_rng = sample_cfm(estimator, key, mu, mask, 3, temperature=0.7)
    z = jax.random.normal(key, mu.shape, dtype=mu.dtype)
    out_z = sample_cfm(estimator, None, mu, mask, 3, temperature=0.7, z=z)
    np.testing.assert_array_equal(np.asarray(out_rng), np.asarray(out_z))


@pytest.mark.parametrize(
    "case",
    [
        # midpoint solver (2 estimator calls/step) through the full chain
        dict(solver="midpoint", n_timesteps=3, temperature=1.0, length_scale=1.0),
        # 1-token utterance: duration of a single token drives the whole path
        dict(solver="euler", n_timesteps=4, temperature=0.667, length_scale=1.0,
             xl=(1, 2)),
        # predicted length EXCEEDS the static budget: the
        # `jnp.minimum(y_lengths, y_max_length)` clamp path (models/matcha.py)
        dict(solver="euler", n_timesteps=4, temperature=1.0, length_scale=4.0,
             budget=64),
        # length_scale < 1: fractional shrunk durations in generate_path
        dict(solver="euler", n_timesteps=4, temperature=1.0, length_scale=0.5),
    ],
    ids=["midpoint", "one_token", "budget_clamp", "short_scale"],
)
def test_synthesise_e2e_parity_envelope(full_size_pair, case):
    """r3-verdict item 9: the quirk-composition chain pinned across the parameter
    ranges users actually touch (solver registry, edge shapes, budget clamp,
    length_scale < 1)."""
    tenc, tdec, params = full_size_pair
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS

    n_timesteps = case["n_timesteps"]
    temperature, length_scale = case["temperature"], case["length_scale"]
    solver = case["solver"]

    b, tx = 2, 20
    rng = np.random.default_rng(11)
    x = rng.integers(3, 140, size=(b, tx)).astype(np.int64)
    xl = np.array(case.get("xl", (20, 13)))
    for i in range(b):
        x[i, xl[i]:] = 0

    xt, xlt = torch.from_numpy(x), torch.from_numpy(xl)
    if "budget" in case:
        y_max_length_ = case["budget"]
    else:
        with torch.no_grad():
            _, logw, x_mask = tenc(xt, xlt)
        w_ceil = torch.ceil(torch.exp(logw) * x_mask) * length_scale
        y_lengths = torch.clamp_min(torch.sum(w_ceil, [1, 2]), 1).long()
        y_max_length_ = torch_ref.torch_fix_len_compatibility(int(y_lengths.max()))
    z = rng.standard_normal((b, 80, y_max_length_)).astype(np.float32)

    out_t = torch_ref.torch_synthesise(
        tenc, tdec, xt, xlt, n_timesteps, torch.from_numpy(z),
        temperature=temperature, length_scale=length_scale,
        y_max_length_=y_max_length_, solver=solver,
    )

    model = MatchaTTS(MatchaConfig(solver=solver))
    out_j = model.apply(
        {"params": params},
        jnp.asarray(x, jnp.int32), jnp.asarray(xl, jnp.int32),
        y_max_length_, n_timesteps, temperature, length_scale,
        method=MatchaTTS.synthesise_fixed,
        z=jnp.asarray(z.transpose(0, 2, 1)),
    )

    np.testing.assert_array_equal(np.asarray(out_j["mel_lengths"]),
                                  out_t["mel_lengths"].numpy())
    np.testing.assert_array_equal(np.asarray(out_j["attn"]), out_t["attn"].numpy())
    mask = out_t["y_mask"].numpy()
    mel_j = np.asarray(out_j["mel"]).transpose(0, 2, 1)
    np.testing.assert_allclose(mel_j * mask, out_t["decoder_outputs"].numpy() * mask,
                               atol=1e-3)
