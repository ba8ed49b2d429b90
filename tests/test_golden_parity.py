"""Frozen-oracle layer parity: flax modules vs committed golden fixtures.

Unlike tests/test_torch_parity.py (which rebuilds the torch oracle live, so an
erroneous oracle edit would move both sides), these fixtures were generated ONCE
(tests/make_golden_fixtures.py) and committed — the expected outputs cannot drift.
No torch needed at test time. Regenerate only when the parity *semantics* are
deliberately changed, with the reference open for re-verification:
RoPE NeoX half-head pairing (`text_encoder.py:99-143,176-177`), masked_fill -1e4
attention (`:210-221`), diffusers additive-mask quirk (`transformer.py:297-340`),
HiFi-GAN conv-transpose padding + weight-norm (`hifi_gan/models.py:75-125`).
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIXTURE = Path(__file__).parent / "fixtures" / "golden_parity.npz"

# reduced-width fixture configs (layer counts match the reference defaults);
# must mirror tests/make_golden_fixtures.py
ENC_KW = dict(n_feats=16, n_channels=64, filter_channels=128, n_heads=2, n_layers=6,
              filter_channels_dp=32)
DEC_KW = dict(in_channels=32, out_channels=16, channels=(64, 64), num_heads=2,
              attention_head_dim=32, num_mid_blocks=2)


@pytest.fixture(scope="module")
def fx():
    if not FIXTURE.exists():
        pytest.skip("golden fixtures missing — run python -m tests.make_golden_fixtures")
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def matcha_params(fx):
    from matcha_tpu.compat.torch_import import convert_matcha_state_dict

    sd = {k[len("sd/"):]: fx[k] for k in fx.files if k.startswith("sd/")}
    return convert_matcha_state_dict(sd)


def test_encoder_matches_golden(fx, matcha_params):
    from matcha_tpu.nn.encoder import EncoderConfig, TextEncoder

    enc = TextEncoder(EncoderConfig(**ENC_KW))
    mu_j, logw_j, _ = enc.apply(
        {"params": matcha_params["encoder"]},
        jnp.asarray(fx["enc/x"], jnp.int32), jnp.asarray(fx["enc/xl"], jnp.int32),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(mu_j).transpose(0, 2, 1), fx["enc/mu"],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(logw_j).transpose(0, 2, 1), fx["enc/logw"],
                               atol=2e-4)


def test_decoder_matches_golden(fx, matcha_params):
    from matcha_tpu.nn.decoder import Decoder, DecoderConfig

    dec = Decoder(DecoderConfig(**DEC_KW))
    out_j = dec.apply(
        {"params": matcha_params["decoder"]},
        jnp.asarray(fx["dec/x"].transpose(0, 2, 1)),
        jnp.asarray(fx["dec/mask"].transpose(0, 2, 1)),
        jnp.asarray(fx["dec/mu"].transpose(0, 2, 1)),
        jnp.asarray(fx["dec/t"]),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1), fx["dec/out"],
                               atol=5e-4)


def test_hifigan_matches_golden(fx):
    from matcha_tpu.compat.torch_import import convert_hifigan_state_dict
    from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

    cfg = HiFiGANConfig(upsample_initial_channel=64)
    sd = {k[len("gsd/"):]: fx[k] for k in fx.files if k.startswith("gsd/")}
    params = convert_hifigan_state_dict(sd, cfg)
    wav_j = np.asarray(
        Generator(cfg).apply({"params": jax.tree.map(jnp.asarray, params)},
                             jnp.asarray(fx["gen/mel"].transpose(0, 2, 1)))
    )
    assert wav_j.shape == fx["gen/wav"].shape
    np.testing.assert_allclose(wav_j, fx["gen/wav"], atol=2e-5)
