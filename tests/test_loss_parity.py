"""Training-loss value parity vs torch on a fixed batch with injected noise.

Assembles the reference training forward (`matcha_tts.py:247-325`) on both sides —
torch oracle from tests/torch_ref.py modules, JAX from matcha_tpu — with identical
weights (via the converter), identical MAS paths, and identical injected (t, z) noise,
and requires the three loss values to match.
"""

import math

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests import torch_ref  # noqa: E402


def test_training_losses_match_torch():
    torch.manual_seed(0)
    tenc = torch_ref.TorchTextEncoder()
    tdec = torch_ref.TorchDecoder()
    tenc.eval()
    tdec.eval()

    from matcha_tpu.compat.torch_import import convert_matcha_state_dict
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS
    from matcha_tpu.ops.mas_cpp import maximum_path_cpp

    sd = {f"encoder.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}
    sd.update({f"decoder.estimator.{k}": v.detach().numpy() for k, v in tdec.state_dict().items()})
    params = convert_matcha_state_dict(sd)

    b, tx, ty, f = 2, 10, 24, 80
    rng = np.random.default_rng(0)
    x = rng.integers(3, 140, size=(b, tx)).astype(np.int64)
    xl = np.array([10, 7])
    y = rng.standard_normal((b, f, ty)).astype(np.float32)
    yl = np.array([24, 18])
    t_noise = np.array([0.35, 0.8], np.float32)
    z_noise = rng.standard_normal((b, f, ty)).astype(np.float32)
    sigma_min = 1e-4

    # ---------------- torch side -----------------------------------------
    with torch.no_grad():
        xt = torch.from_numpy(x)
        mu_x, logw, x_mask = tenc(xt, torch.from_numpy(xl))
        yt = torch.from_numpy(y)
        y_mask = (torch.arange(ty)[None, :] < torch.from_numpy(yl)[:, None]).unsqueeze(1).float()
        attn_mask = x_mask.unsqueeze(-1) * y_mask.unsqueeze(2)  # (B,1,Tx,Ty)

        const = -0.5 * math.log(2 * math.pi) * f
        factor = -0.5 * torch.ones_like(mu_x)
        y_square = torch.matmul(factor.transpose(1, 2), yt**2)
        y_mu_double = torch.matmul(2.0 * (factor * mu_x).transpose(1, 2), yt)
        mu_square = torch.sum(factor * (mu_x**2), 1).unsqueeze(-1)
        log_prior = y_square - y_mu_double + mu_square + const

        attn_t = torch.from_numpy(
            maximum_path_cpp(log_prior.numpy(), attn_mask.squeeze(1).numpy())
        )

        logw_ = torch.log(1e-8 + torch.sum(attn_t.unsqueeze(1), -1)) * x_mask
        dur_loss_t = torch.sum((logw - logw_) ** 2) / torch.sum(torch.from_numpy(xl))

        mu_y = torch.matmul(attn_t.transpose(1, 2), mu_x.transpose(1, 2)).transpose(1, 2)

        tt = torch.from_numpy(t_noise)[:, None, None]
        zt = torch.from_numpy(z_noise)
        phi_t = (1 - (1 - sigma_min) * tt) * zt + tt * yt
        u_target = zt.mul(0).add(yt) - (1 - sigma_min) * zt
        u_pred = tdec(phi_t, y_mask, mu_y, tt.squeeze())
        # masked formulation (see matcha_tpu/flow docstring)
        diff_loss_t = torch.sum(((u_pred - u_target) ** 2) * y_mask) / (torch.sum(y_mask) * f)

        prior_loss_t = torch.sum(0.5 * ((yt - mu_y) ** 2 + math.log(2 * math.pi)) * y_mask)
        prior_loss_t = prior_loss_t / (torch.sum(y_mask) * f)

    # ---------------- jax side -------------------------------------------
    from matcha_tpu.nn.decoder import Decoder, DecoderConfig
    from matcha_tpu.nn.encoder import EncoderConfig, TextEncoder
    from matcha_tpu.ops import duration_loss, maximum_path_ref, sequence_mask

    enc = TextEncoder(EncoderConfig())
    mu_j, logw_j, mask_j = enc.apply(
        {"params": params["encoder"]}, jnp.asarray(x, jnp.int32), jnp.asarray(xl, jnp.int32),
        deterministic=True,
    )
    y_j = jnp.asarray(y.transpose(0, 2, 1))  # (B,Ty,F)
    y_mask_j = sequence_mask(jnp.asarray(yl, jnp.int32), ty).astype(jnp.float32)[:, :, None]
    attn_mask_j = mask_j[:, :, 0][:, :, None] * y_mask_j[:, :, 0][:, None, :]

    const = -0.5 * math.log(2 * math.pi) * f
    s_yy = -0.5 * jnp.sum(y_j**2, axis=-1)
    cross = jnp.einsum("bxf,byf->bxy", mu_j, y_j)
    s_mm = -0.5 * jnp.sum(mu_j**2, axis=-1)
    log_prior_j = s_yy[:, None, :] + cross + s_mm[:, :, None] + const
    np.testing.assert_allclose(np.asarray(log_prior_j), log_prior.numpy(), atol=2e-3)

    attn_j = maximum_path_ref(log_prior_j, attn_mask_j)
    np.testing.assert_array_equal(np.asarray(attn_j), attn_t.numpy())

    logw_tgt = jnp.log(1e-8 + jnp.sum(attn_j, axis=-1))[:, :, None] * mask_j
    dur_j = duration_loss(logw_j, logw_tgt, jnp.asarray(xl))

    mu_y_j = jnp.einsum("bxy,bxf->byf", attn_j, mu_j)

    dec = Decoder(DecoderConfig())
    tt_j = jnp.asarray(t_noise)
    z_j = jnp.asarray(z_noise.transpose(0, 2, 1))
    phi_j = (1 - (1 - sigma_min) * tt_j[:, None, None]) * z_j + tt_j[:, None, None] * y_j
    u_tgt_j = y_j - (1 - sigma_min) * z_j
    u_pred_j = dec.apply(
        {"params": params["decoder"]}, phi_j, y_mask_j, mu_y_j, tt_j, deterministic=True
    )
    diff_j = jnp.sum(((u_pred_j - u_tgt_j) ** 2) * y_mask_j) / (jnp.sum(y_mask_j) * f)

    prior_j = jnp.sum(0.5 * ((y_j - mu_y_j) ** 2 + math.log(2 * math.pi)) * y_mask_j)
    prior_j = prior_j / (jnp.sum(y_mask_j) * f)

    np.testing.assert_allclose(float(dur_j), float(dur_loss_t), rtol=2e-4)
    np.testing.assert_allclose(float(prior_j), float(prior_loss_t), rtol=2e-4)
    np.testing.assert_allclose(float(diff_j), float(diff_loss_t), rtol=2e-3)
