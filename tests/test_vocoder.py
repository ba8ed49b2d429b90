"""Vocoder tests: Griffin-Lim reconstruction quality, inverse-mel NNLS, HiFi-GAN shapes
and GAN losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.audio.griffin_lim import griffin_lim, inverse_mel
from matcha_tpu.audio.mel import MelConfig, mel_spectrogram, stft_magnitude

CFG = MelConfig()


def test_griffin_lim_reconstructs_tone():
    """A pure tone's magnitude STFT should reconstruct to a highly correlated tone."""
    from matcha_tpu.audio.griffin_lim import _stft

    t = np.arange(22050 // 2) / 22050.0
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None, :]
    mag = jnp.abs(_stft(CFG, jnp.asarray(y)))  # GL's own (center=True) analysis frames
    rec = np.asarray(griffin_lim(CFG, mag, n_iter=32, length=y.shape[1]))
    # compare spectral envelopes (phase-invariant)
    m1 = np.asarray(mag)
    m2 = np.asarray(jnp.abs(_stft(CFG, jnp.asarray(rec))))
    corr = np.corrcoef(m1.ravel(), m2.ravel())[0, 1]
    assert corr > 0.99


def test_inverse_mel_roundtrip():
    """mel_basis @ inverse_mel(mel) ~= mel for a realistic magnitude spectrum."""
    rng = np.random.default_rng(0)
    t = np.arange(22050 // 2) / 22050.0
    y = (0.4 * np.sin(2 * np.pi * 523 * t) + 0.05 * rng.standard_normal(len(t))).astype(
        np.float32
    )[None, :]
    mel = np.exp(np.asarray(mel_spectrogram(CFG, jnp.asarray(y))))  # linear mel
    spec = np.asarray(inverse_mel(CFG, jnp.asarray(mel), n_iter=150))
    assert (spec >= 0).all()
    from matcha_tpu.audio.filters import mel_filterbank

    fb = mel_filterbank(CFG.sample_rate, CFG.n_fft, CFG.n_mels, CFG.fmin, CFG.fmax)
    mel_rec = np.einsum("mf,bft->bmt", fb, spec)
    rel = np.abs(mel_rec - mel).sum() / mel.sum()
    assert rel < 0.05


def test_hifigan_generator_output_shape_small():
    from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

    cfg = HiFiGANConfig(upsample_initial_channel=32)
    gen = Generator(cfg)
    mel = jnp.zeros((2, 5, 80))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (2, 5 * 8 * 8 * 2 * 2)
    assert (np.abs(np.asarray(wav)) <= 1.0).all()  # tanh range


def test_discriminators_and_gan_losses():
    from matcha_tpu.models.hifigan import (
        MultiPeriodDiscriminator,
        MultiScaleDiscriminator,
        discriminator_loss,
        feature_loss,
        generator_loss,
    )

    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32))
    y_hat = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32))

    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    params = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    o_r, o_g, f_r, f_g = mpd.apply(params, y, y_hat)
    assert len(o_r) == 2

    d_loss, r_losses, g_losses = discriminator_loss(o_r, o_g)
    g_loss, gen_losses = generator_loss(o_g)
    f_loss = feature_loss(f_r, f_g)
    for v in (d_loss, g_loss, f_loss):
        assert np.isfinite(float(v))
    # perfect discriminator on real (output 1) and fake (output 0) -> zero loss
    ones = [jnp.ones_like(o) for o in o_r]
    zeros = [jnp.zeros_like(o) for o in o_g]
    d0, _, _ = discriminator_loss(ones, zeros)
    assert float(d0) == 0.0

    msd = MultiScaleDiscriminator()
    params = msd.init(jax.random.PRNGKey(0), y, y_hat)
    o_r, o_g, f_r, f_g = msd.apply(params, y, y_hat)
    assert len(o_r) == 3


def test_subpixel_upsample_matches_conv_transpose():
    """Generator(upsample_impl='subpixel') == the conv_transpose lowering on the
    SAME parameter tree: one dense conv + channel->time reshape replaces the
    zero-dilated transposed conv (1/u of the MXU work) with identical math."""
    import jax
    import jax.numpy as jnp

    from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

    cfg = HiFiGANConfig(upsample_initial_channel=32, num_mels=8)
    g_ct = Generator(cfg, weight_norm=False)
    g_sp = Generator(cfg, weight_norm=False, upsample_impl="subpixel")
    params = g_ct.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8)))["params"]
    params = jax.tree.map(
        lambda a: jax.random.normal(
            jax.random.PRNGKey(hash(str(a.shape)) % 2**31), a.shape) * 0.05,
        params,
    )
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 8))
    y_ct = g_ct.apply({"params": params}, mel)
    y_sp = g_sp.apply({"params": params}, mel)
    assert y_ct.shape == y_sp.shape
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ct),
                               atol=1e-6, rtol=1e-5)


def test_pallas_mrf_matches_xla_resblocks():
    """Generator(resblock_impl='pallas'): each MRF dilation step fused in VMEM
    == the flax/XLA resblocks on the SAME parameter tree (interpret mode here;
    the on-chip win is recorded in DESIGN.md)."""
    import jax
    import jax.numpy as jnp

    from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

    cfg = HiFiGANConfig(upsample_initial_channel=32, num_mels=8)
    g_x = Generator(cfg, weight_norm=False)
    g_p = Generator(cfg, weight_norm=False, resblock_impl="pallas")
    params = g_x.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8)))["params"]
    params = jax.tree.map(
        lambda a: jax.random.normal(
            jax.random.PRNGKey(hash(str(a.shape)) % 2**31), a.shape) * 0.05,
        params,
    )
    # identical param trees (the _RawWNConv shells reproduce WNConv's layout)
    import jax.tree_util as jtu
    p2 = g_p.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8)))["params"]
    assert ({jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(params)}
            == {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(p2)})
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 8))
    y_x = g_x.apply({"params": params}, mel)
    y_p = g_p.apply({"params": params}, mel)
    assert y_x.shape == y_p.shape
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               atol=1e-6, rtol=1e-5)


def test_fused_mrf_step_pack_modes_match_xla():
    """fused_mrf_step at BOTH lowering modes — per-tap matmuls (C > 128) and
    im2col tap packing (C <= 128, the r5 follow-up) — equals the XLA dilated-conv
    math on random data, including edge-tile zero padding."""
    import jax
    import jax.numpy as jnp

    from matcha_tpu.ops.mrf_pallas import _pack_mode, fused_mrf_step

    rng = np.random.default_rng(7)
    for c, k, d, t in ((32, 11, 5, 128), (64, 7, 3, 256), (256, 3, 5, 128)):
        pack, _ = _pack_mode(k, c, jnp.float32)
        assert pack == (c <= 64)  # measured threshold, see _pack_mode
        x = jnp.asarray(rng.standard_normal((2, t, c)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((c,)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((k, c, c)) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((c,)) * 0.05, jnp.float32)
        got = fused_mrf_step(x, w1, b1, w2, b2, dilation=d)

        def lrelu(v):
            return jnp.where(v >= 0, v, 0.1 * v)

        xt = lrelu(x)
        xt = jax.lax.conv_general_dilated(
            xt, w1, (1,), [(d * (k - 1) // 2,) * 2], rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC")) + b1
        xt = lrelu(xt)
        xt = jax.lax.conv_general_dilated(
            xt, w2, (1,), [((k - 1) // 2,) * 2],
            dimension_numbers=("NWC", "WIO", "NWC")) + b2
        want = x + xt
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"c={c} k={k} d={d}")
