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


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-4), (jnp.bfloat16, 6e-2)])
@pytest.mark.parametrize("t", [64, 256])
def test_fused_attention_grads_match_xla(dtype, tol, t):
    """custom_vjp fused backward (r4 verdict item 1): dq/dk/dv of the Pallas
    kernel == the XLA einsum path's autodiff, at both training dtypes."""
    b, h, d = 2, 3, 64
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    bias = jnp.asarray(rng.integers(0, 2, size=(b, t)), dtype)
    scale = 1.0 / np.sqrt(d)
    co = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)  # fixed cotangent

    def loss_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, bias, scale=scale)
                       .astype(jnp.float32) * co.astype(jnp.float32))

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, bias, scale)
                       .astype(jnp.float32) * co.astype(jnp.float32))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        an, bn = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        scale_ref = max(np.abs(bn).max(), 1.0)
        np.testing.assert_allclose(an / scale_ref, bn / scale_ref, atol=tol)


def test_fused_attention_bias_grad():
    """The additive-bias cotangent (sum over heads and query rows of ds) also
    matches XLA — the mask is non-trainable in practice, but the VJP must be
    correct for any caller that differentiates through the bias."""
    b, h, t, d = 2, 2, 64, 64
    rng = np.random.default_rng(4)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(rng.standard_normal((b, t)), jnp.float32)

    gp = jax.grad(lambda bb: jnp.sum(fused_attention(q, k, v, bb, scale=0.125) ** 2))(bias)
    gx = jax.grad(lambda bb: jnp.sum(_xla_attention(q, k, v, bb, 0.125) ** 2))(bias)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4, rtol=1e-4)


def test_decoder_grads_with_pallas_attention():
    """End-to-end: grads of a decoder loss agree between attn_impl settings."""
    from matcha_tpu.nn.decoder import Decoder, DecoderConfig

    kw = dict(in_channels=16, out_channels=8, channels=(16, 16),
              attention_head_dim=8, num_heads=2, num_mid_blocks=1)
    dx = Decoder(DecoderConfig(**kw))
    dp = Decoder(DecoderConfig(**kw, attn_impl="pallas"))
    rng = np.random.default_rng(5)
    xt = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    mask = jnp.ones((2, 32, 1), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    tt = jnp.asarray([0.3, 0.8], jnp.float32)
    params = dx.init(jax.random.PRNGKey(0), xt, mask, mu, tt, deterministic=True)["params"]

    def loss(d, p):
        return jnp.mean(d.apply({"params": p}, xt, mask, mu, tt, deterministic=True) ** 2)

    gx = jax.grad(lambda p: loss(dx, p))(params)
    gp = jax.grad(lambda p: loss(dp, p))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = {jax.tree_util.keystr(kp): g for kp, g in jax.tree_util.tree_leaves_with_path(gp)}
    for kp, g in flat_x:
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(flat_p[jax.tree_util.keystr(kp)]),
            atol=5e-5, rtol=5e-4, err_msg=jax.tree_util.keystr(kp))
