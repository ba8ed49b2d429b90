"""Fused Pallas attention vs the XLA einsum path (exact semantics incl. the
diffusers raw-mask-as-additive-bias quirk)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.ops.attention_pallas import fused_attention


def _xla_attention(q, k, v, bias, scale):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        scores = scores + bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-6), (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("t", [64, 256])
def test_fused_attention_matches_xla(dtype, tol, t):
    b, h, d = 3, 4, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    # the decoder passes the raw 0/1 mask as additive bias (reference quirk)
    bias = jnp.asarray(rng.integers(0, 2, size=(b, t)), dtype)
    scale = 1.0 / np.sqrt(d)

    got = fused_attention(q, k, v, bias, scale=scale)
    want = _xla_attention(q, k, v, bias, scale)
    assert got.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol, rtol=tol
    )


def test_fused_attention_no_bias():
    b, h, t, d = 2, 2, 128, 64
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
               for _ in range(3))
    got = fused_attention(q, k, v, None, scale=0.125)
    want = _xla_attention(q, k, v, None, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6, rtol=2e-6)


def test_decoder_attn_impl_flag_same_params():
    """attn_impl='pallas' uses the identical parameter tree and matches 'xla'."""
    from matcha_tpu.nn.decoder import Decoder, DecoderConfig

    cfg_x = DecoderConfig(in_channels=16, out_channels=8, channels=(16, 16),
                          attention_head_dim=8, num_heads=2, num_mid_blocks=1)
    cfg_p = DecoderConfig(in_channels=16, out_channels=8, channels=(16, 16),
                          attention_head_dim=8, num_heads=2, num_mid_blocks=1,
                          attn_impl="pallas")
    dx, dp = Decoder(cfg_x), Decoder(cfg_p)
    rng = np.random.default_rng(2)
    xt = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    mask = jnp.asarray((np.arange(32)[None] < np.array([20, 32])[:, None])
                       .astype(np.float32))[:, :, None]
    mu = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    tt = jnp.asarray([0.3, 0.8], jnp.float32)
    params = dx.init(jax.random.PRNGKey(0), xt, mask, mu, tt, deterministic=True)["params"]
    ox = dx.apply({"params": params}, xt, mask, mu, tt, deterministic=True)
    op = dp.apply({"params": params}, xt, mask, mu, tt, deterministic=True)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(op), atol=1e-5, rtol=1e-5)
