"""Numerical parity: flax modules + torch->jax converter vs the torch oracle.

Builds reference-semantics torch models (tests/torch_ref.py) with reference-compatible
state_dict names, converts their weights with matcha_tpu.compat, and requires layerwise
allclose. This is the SURVEY §7 step-4 parity milestone, minus the released checkpoint
download (offline environment).
"""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests import torch_ref  # noqa: E402


@pytest.fixture(scope="module")
def encoder_pair():
    torch.manual_seed(0)
    tenc = torch_ref.TorchTextEncoder()
    tenc.eval()
    sd = {f"encoder.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}
    from matcha_tpu.compat.torch_import import convert_matcha_state_dict

    # decoder keys are required by the converter; synthesize them from a torch decoder
    tdec = torch_ref.TorchDecoder()
    sd.update({f"decoder.estimator.{k}": v.detach().numpy() for k, v in tdec.state_dict().items()})
    params = convert_matcha_state_dict(sd)
    return tenc, tdec, params


def test_text_encoder_parity(encoder_pair):
    tenc, _, params = encoder_pair
    from matcha_tpu.nn.encoder import EncoderConfig, TextEncoder

    b, tx = 2, 12
    rng = np.random.default_rng(0)
    x = rng.integers(3, 140, size=(b, tx)).astype(np.int64)
    xl = np.array([12, 9])

    with torch.no_grad():
        mu_t, logw_t, mask_t = tenc(torch.from_numpy(x), torch.from_numpy(xl))

    enc = TextEncoder(EncoderConfig())
    out = enc.apply(
        {"params": params["encoder"]},
        jnp.asarray(x, jnp.int32), jnp.asarray(xl, jnp.int32), deterministic=True,
    )
    mu_j, logw_j, mask_j = out
    # feature-last -> channels-first for comparison
    np.testing.assert_allclose(
        np.asarray(mu_j).transpose(0, 2, 1), mu_t.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(logw_j).transpose(0, 2, 1), logw_t.numpy(), atol=2e-4
    )


def test_decoder_parity(encoder_pair):
    _, tdec, params = encoder_pair
    from matcha_tpu.nn.decoder import Decoder, DecoderConfig

    tdec.eval()
    b, t, f = 2, 16, 80
    rng = np.random.default_rng(1)
    x = rng.standard_normal((b, f, t)).astype(np.float32)
    mu = rng.standard_normal((b, f, t)).astype(np.float32)
    mask = np.ones((b, 1, t), np.float32)
    mask[1, :, 12:] = 0.0
    tt = np.array([0.3, 0.7], np.float32)

    with torch.no_grad():
        out_t = tdec(torch.from_numpy(x), torch.from_numpy(mask), torch.from_numpy(mu),
                     torch.from_numpy(tt))

    dec = Decoder(DecoderConfig())
    out_j = dec.apply(
        {"params": params["decoder"]},
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mask.transpose(0, 2, 1)),
        jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(tt), deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 2, 1), out_t.numpy(), atol=5e-4
    )


def test_hifigan_generator_parity():
    torch.manual_seed(2)
    tgen = torch_ref.TorchHiFiGenerator()
    # weight-norm the convs so the converter's g*v/||v|| folding path is exercised
    for m in tgen.modules():
        if isinstance(m, (torch.nn.Conv1d, torch.nn.ConvTranspose1d)):
            torch.nn.utils.weight_norm(m)
    tgen.eval()

    from matcha_tpu.compat.torch_import import convert_hifigan_state_dict
    from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

    sd = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}
    params = convert_hifigan_state_dict(sd)

    b, t = 1, 6
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((b, 80, t)).astype(np.float32)
    with torch.no_grad():
        wav_t = tgen(torch.from_numpy(mel)).numpy()[:, 0, :]

    gen = Generator(HiFiGANConfig())
    wav_j = np.asarray(
        gen.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(mel.transpose(0, 2, 1)))
    )
    assert wav_j.shape == wav_t.shape == (b, t * 256)
    np.testing.assert_allclose(wav_j, wav_t, atol=2e-5)
