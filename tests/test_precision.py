"""bf16 serving mode: runs end-to-end and stays close to the fp32 output."""

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params
from matcha_tpu.models.precision import bf16_serving, cast_params
from matcha_tpu.nn.decoder import DecoderConfig
from matcha_tpu.nn.encoder import EncoderConfig

TINY = MatchaConfig(
    n_feats=8,
    encoder=EncoderConfig(n_feats=8, n_channels=16, filter_channels=32, n_heads=2,
                          n_layers=2, filter_channels_dp=16),
    decoder=DecoderConfig(in_channels=16, out_channels=8, channels=(16, 16),
                          attention_head_dim=8, num_heads=2, num_mid_blocks=1),
)


def test_cast_params_dtypes():
    model = MatchaTTS(TINY)
    params = init_params(model, jax.random.PRNGKey(0), tx=8, ty=16)
    bf16 = bf16_serving(params)
    for leaf in jax.tree.leaves(bf16):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.bfloat16
    back = cast_params(bf16, jnp.float32)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=8e-3, atol=1e-4)


def test_bf16_synthesis_runs_end_to_end():
    """bf16 params keep the whole pipeline in bf16 with identical alignments.

    Mel closeness is NOT asserted on the full ODE rollout — with random weights the
    feedback loop amplifies any perturbation (chaos), so closeness is only meaningful
    per network call (next test) or with trained weights.
    """
    model = MatchaTTS(TINY)
    params = init_params(model, jax.random.PRNGKey(0), tx=8, ty=16)
    x = jnp.array([[5, 6, 7, 8, 9, 10, 11, 12]])
    xl = jnp.array([8])

    def run(p):
        return model.apply(
            {"params": p}, x, xl, 32, 4, method=MatchaTTS.synthesise_fixed,
            rngs={"noise": jax.random.PRNGKey(7)},
        )

    f32 = run(params)
    bf16 = run(bf16_serving(params))
    assert bf16["mel"].dtype == jnp.bfloat16
    assert bf16["encoder_outputs"].dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(bf16["mel"], np.float32)).all()
    # identical alignment: durations are coarse enough to be bf16-robust
    np.testing.assert_array_equal(
        np.asarray(f32["attn"], np.float32), np.asarray(bf16["attn"], np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(f32["mel_lengths"]), np.asarray(bf16["mel_lengths"])
    )


def test_bf16_single_network_calls_close_to_fp32():
    """Per-call bf16 error stays at the ~1% level (no silent f32 promotion, no blowup)."""
    from matcha_tpu.nn.decoder import Decoder
    from matcha_tpu.nn.encoder import TextEncoder

    model = MatchaTTS(TINY)
    params = init_params(model, jax.random.PRNGKey(0), tx=8, ty=16)
    pb = bf16_serving(params)
    rng = np.random.default_rng(0)

    enc = TextEncoder(TINY.encoder)
    x = jnp.array([[5, 6, 7, 8, 9, 10, 11, 12]])
    xl = jnp.array([8])
    mu32, logw32, _ = enc.apply({"params": params["encoder"]}, x, xl, deterministic=True)
    mu16, logw16, _ = enc.apply({"params": pb["encoder"]}, x, xl, deterministic=True)
    assert mu16.dtype == jnp.bfloat16

    def rel(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        return np.abs(a - b).mean() / (np.abs(a).mean() + 1e-6)

    assert rel(mu32, mu16) < 0.05
    assert rel(logw32, logw16) < 0.05

    dec = Decoder(TINY.decoder)
    xt = jnp.asarray(rng.standard_normal((1, 16, 8)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((1, 16, 8)), jnp.float32)
    mask = jnp.ones((1, 16, 1))
    t = jnp.asarray([0.4])
    o32 = dec.apply({"params": params["decoder"]}, xt, mask, mu, t, deterministic=True)
    o16 = dec.apply(
        {"params": pb["decoder"]}, xt.astype(jnp.bfloat16), mask.astype(jnp.bfloat16),
        mu.astype(jnp.bfloat16), t, deterministic=True,
    )
    assert o16.dtype == jnp.bfloat16
    assert rel(o32, o16) < 0.05


def test_mixed_precision_training_step():
    """bf16 mixed-precision train step: finite, learns, f32 master weights."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from matcha_tpu.models.matcha import MatchaTTS, init_params
    from matcha_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step
    from tests.test_train import TINY, _tiny_batch

    model = MatchaTTS(TINY)
    params = init_params(model, jax.random.PRNGKey(0), tx=8, ty=16)
    cfg = TrainConfig(accumulate_steps=1, mas_impl="ref", precision="bf16",
                      log_grad_norm=True)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch().items()}

    losses = []
    for _ in range(8):
        params, opt_state, metrics = step(params, opt_state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    # master weights stay f32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params)
               if jnp.issubdtype(p.dtype, jnp.floating))


def test_mixed_precision_loss_close_to_fp32():
    """The bf16-decoder loss value stays within bf16 tolerance of the f32 loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from matcha_tpu.models.matcha import MatchaTTS, init_params
    from matcha_tpu.models.precision import mixed_precision_params
    from tests.test_train import TINY, _tiny_batch

    model = MatchaTTS(TINY)
    params = init_params(model, jax.random.PRNGKey(0), tx=8, ty=16)
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch().items()}

    def losses(params, decoder_dtype):
        out = model.apply(
            {"params": params}, batch["x"], batch["x_lengths"], batch["y"],
            batch["y_lengths"], deterministic=True, mas_impl="ref",
            decoder_dtype=decoder_dtype, method=MatchaTTS.compute_losses,
            rngs={"cfm": jax.random.PRNGKey(3)},
        )
        return {k: float(out[k]) for k in ("dur_loss", "prior_loss", "diff_loss")}

    f32 = losses(params, None)
    b16 = losses(mixed_precision_params(params), jnp.bfloat16)
    # dur/prior don't touch the decoder: bit-identical
    assert f32["dur_loss"] == b16["dur_loss"]
    assert f32["prior_loss"] == b16["prior_loss"]
    np.testing.assert_allclose(b16["diff_loss"], f32["diff_loss"], rtol=0.05)
