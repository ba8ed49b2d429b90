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
