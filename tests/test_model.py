"""Model-level smoke and invariant tests for MatchaTTS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params
from matcha_tpu.nn.decoder import DecoderConfig
from matcha_tpu.nn.encoder import EncoderConfig

# Tiny config for fast CPU tests
TINY = MatchaConfig(
    n_vocab=150,
    n_feats=8,
    encoder=EncoderConfig(
        n_vocab=150, n_feats=8, n_channels=16, filter_channels=32, n_heads=2,
        n_layers=2, filter_channels_dp=16,
    ),
    decoder=DecoderConfig(
        in_channels=16, out_channels=8, channels=(16, 16), attention_head_dim=8,
        num_heads=2, num_mid_blocks=1,
    ),
)


@pytest.fixture(scope="module")
def model_and_params():
    model = MatchaTTS(TINY)
    params = init_params(model, jax.random.PRNGKey(0), tx=8, ty=16)
    return model, params


def test_param_count_nontrivial(model_and_params):
    model, params = model_and_params
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    assert n > 10_000


def test_losses_finite_and_mask_invariant(model_and_params):
    model, params = model_and_params
    rng = jax.random.PRNGKey(1)
    b, tx, ty = 2, 10, 24
    x = jax.random.randint(rng, (b, tx), 3, 50)
    xl = jnp.array([10, 7])
    y = jax.random.normal(rng, (b, ty, TINY.n_feats))
    yl = jnp.array([24, 16])

    out = model.apply(
        {"params": params}, x, xl, y, yl, deterministic=True, mas_impl="ref",
        method=MatchaTTS.compute_losses, rngs={"cfm": jax.random.PRNGKey(2)},
    )
    for k in ("dur_loss", "prior_loss", "diff_loss"):
        assert np.isfinite(float(out[k])), k

    # Padding invariance: garbage in padded regions must not change losses.
    x2 = x.at[1, 7:].set(99)
    y2 = y.at[1, 16:, :].set(1234.5)
    out2 = model.apply(
        {"params": params}, x2, xl, y2, yl, deterministic=True, mas_impl="ref",
        method=MatchaTTS.compute_losses, rngs={"cfm": jax.random.PRNGKey(2)},
    )
    for k in ("dur_loss", "prior_loss", "diff_loss"):
        np.testing.assert_allclose(float(out[k]), float(out2[k]), rtol=1e-5, err_msg=k)


def test_attn_is_valid_alignment(model_and_params):
    model, params = model_and_params
    rng = jax.random.PRNGKey(3)
    b, tx, ty = 2, 6, 16
    x = jax.random.randint(rng, (b, tx), 3, 50)
    xl = jnp.array([6, 4])
    y = jax.random.normal(rng, (b, ty, TINY.n_feats))
    yl = jnp.array([16, 12])
    out = model.apply(
        {"params": params}, x, xl, y, yl, deterministic=True, mas_impl="ref",
        method=MatchaTTS.compute_losses, rngs={"cfm": jax.random.PRNGKey(2)},
    )
    attn = np.asarray(out["attn"])
    for i in range(b):
        a = attn[i, : int(xl[i]), : int(yl[i])]
        np.testing.assert_array_equal(a.sum(axis=0), 1)
        assert (a.sum(axis=1) >= 1).all()


def test_synthesise_fixed_shapes_and_determinism(model_and_params):
    model, params = model_and_params
    x = jnp.array([[5, 6, 7, 8, 9, 10, 11, 12]])
    xl = jnp.array([8])
    out = model.apply(
        {"params": params}, x, xl, 32, 4, method=MatchaTTS.synthesise_fixed,
        rngs={"noise": jax.random.PRNGKey(7)},
    )
    assert out["mel"].shape == (1, 32, TINY.n_feats)
    assert out["attn"].shape == (1, 8, 32)
    assert int(out["mel_lengths"][0]) >= 1
    # same rng -> identical output
    out2 = model.apply(
        {"params": params}, x, xl, 32, 4, method=MatchaTTS.synthesise_fixed,
        rngs={"noise": jax.random.PRNGKey(7)},
    )
    np.testing.assert_array_equal(np.asarray(out["mel"]), np.asarray(out2["mel"]))


def test_dropout_rng_changes_training_loss(model_and_params):
    model, params = model_and_params
    rng = jax.random.PRNGKey(4)
    x = jax.random.randint(rng, (2, 8), 3, 50)
    xl = jnp.array([8, 8])
    y = jax.random.normal(rng, (2, 16, TINY.n_feats))
    yl = jnp.array([16, 16])

    def loss(drop_key, cfm_key):
        out = model.apply(
            {"params": params}, x, xl, y, yl, deterministic=False, mas_impl="ref",
            method=MatchaTTS.compute_losses,
            rngs={"cfm": cfm_key, "dropout": drop_key},
        )
        return float(out["diff_loss"])

    l1 = loss(jax.random.PRNGKey(0), jax.random.PRNGKey(9))
    l2 = loss(jax.random.PRNGKey(1), jax.random.PRNGKey(9))
    assert l1 != l2  # dropout active


def test_durations_injection_skips_mas(model_and_params):
    """`durations=` path (`matcha_tts.py:254` analog): attn must equal the
    deterministic cumsum path built from the injected durations, not the MAS path."""
    from matcha_tpu.ops.masks import generate_path, sequence_mask

    model, params = model_and_params
    rng = jax.random.PRNGKey(3)
    b, tx, ty = 2, 6, 16
    x = jax.random.randint(rng, (b, tx), 3, 50)
    xl = jnp.array([6, 4])
    y = jax.random.normal(rng, (b, ty, TINY.n_feats))
    # durations: token i claims dur[i] frames; sum == y_lengths
    dur = jnp.array([[3, 2, 4, 1, 2, 4], [5, 3, 2, 0, 0, 0]], jnp.float32)
    yl = jnp.sum(dur, axis=1).astype(jnp.int32)

    out = model.apply(
        {"params": params}, x, xl, y, yl, deterministic=True, durations=dur,
        method=MatchaTTS.compute_losses, rngs={"cfm": jax.random.PRNGKey(0)},
    )
    x_mask = sequence_mask(xl, tx).astype(jnp.float32)
    y_mask = sequence_mask(yl, ty).astype(jnp.float32)
    attn_mask = x_mask[:, :, None] * y_mask[:, None, :]
    expected = generate_path(dur, attn_mask)
    np.testing.assert_array_equal(np.asarray(out["attn"]), np.asarray(expected))
    # every frame within y_lengths is claimed by exactly one token
    col = np.asarray(out["attn"]).sum(axis=1)
    for i in range(b):
        np.testing.assert_array_equal(col[i, : int(yl[i])], 1.0)
    for k in ("dur_loss", "prior_loss", "diff_loss"):
        assert np.isfinite(float(out[k]))


def test_out_size_crop_matches_hand_trimmed_batch(model_and_params):
    """out_size random-crop training path (`matcha_tts.py:290-312`).

    With y_lengths == out_size every sample's crop offset is forced to 0, so the
    cropped branch must produce EXACTLY the losses of calling compute_losses on a
    hand-trimmed batch (y[:, :out_size]) with the same rngs — same CFM noise shapes,
    same masks, same alignment.
    """
    model, params = model_and_params
    rng = jax.random.PRNGKey(4)
    b, tx, ty, out_size = 2, 6, 32, 16
    x = jax.random.randint(rng, (b, tx), 3, 50)
    xl = jnp.array([6, 4])
    y = jax.random.normal(rng, (b, ty, TINY.n_feats))
    y = y.at[:, out_size:, :].set(0.0)  # padded region zeroed, as collate produces
    yl = jnp.array([out_size, out_size])
    rngs = {"cfm": jax.random.PRNGKey(7), "crop": jax.random.PRNGKey(8)}

    cropped = model.apply(
        {"params": params}, x, xl, y, yl, deterministic=True, mas_impl="ref",
        out_size=out_size, method=MatchaTTS.compute_losses, rngs=rngs,
    )
    trimmed = model.apply(
        {"params": params}, x, xl, y[:, :out_size], yl, deterministic=True,
        mas_impl="ref", method=MatchaTTS.compute_losses, rngs=rngs,
    )
    for k in ("dur_loss", "prior_loss", "diff_loss"):
        np.testing.assert_allclose(float(cropped[k]), float(trimmed[k]), rtol=1e-5,
                                   err_msg=f"{k} diverges between crop and trim")


def test_out_size_random_offsets_keep_dur_loss(model_and_params):
    """Random (nonzero-offset) crops: dur_loss is computed BEFORE the crop and must be
    invariant to it; diff/prior stay finite and the attn stays a valid path."""
    model, params = model_and_params
    rng = jax.random.PRNGKey(5)
    b, tx, ty, out_size = 2, 5, 48, 16
    x = jax.random.randint(rng, (b, tx), 3, 50)
    xl = jnp.array([5, 4])
    y = jax.random.normal(rng, (b, ty, TINY.n_feats))
    yl = jnp.array([48, 40])
    rngs = {"cfm": jax.random.PRNGKey(9), "crop": jax.random.PRNGKey(10)}

    out = model.apply(
        {"params": params}, x, xl, y, yl, deterministic=True, mas_impl="ref",
        out_size=out_size, method=MatchaTTS.compute_losses, rngs=rngs,
    )
    full = model.apply(
        {"params": params}, x, xl, y, yl, deterministic=True, mas_impl="ref",
        method=MatchaTTS.compute_losses, rngs=rngs,
    )
    np.testing.assert_allclose(float(out["dur_loss"]), float(full["dur_loss"]), rtol=1e-6)
    for k in ("prior_loss", "diff_loss"):
        assert np.isfinite(float(out[k]))
    # the returned (cropped) attn window: each in-window frame claimed by <= 1 token
    col = np.asarray(out["attn"]).sum(axis=1)
    assert col.max() <= 1.0 + 1e-6
