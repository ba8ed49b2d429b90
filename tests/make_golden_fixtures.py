"""Generate the frozen parity fixtures (`tests/fixtures/golden_parity.npz`).

Run manually (requires torch):  python -m tests.make_golden_fixtures

Pins the torch oracle (tests/torch_ref.py) against drift: the oracle's weights,
inputs, and outputs are frozen into one npz so layer-parity checks
(tests/test_golden_parity.py) run WITHOUT torch at test time and cannot silently
co-drift with an edited oracle. Reduced widths, reference layer COUNTS (6 encoder
layers, 2 down/2 mid/2 up U-Net blocks, full HiFi-GAN v1 topology) — the behaviors
under test (NeoX half-head RoPE, diffusers additive-mask quirk, conv-transpose
padding math, weight-norm folding) are width-independent.
"""

import pathlib

import numpy as np
import torch

from tests import torch_ref

OUT = pathlib.Path(__file__).parent / "fixtures" / "golden_parity.npz"

# reduced-width configs (layer counts match the reference defaults)
ENC = dict(n_vocab=150, n_feats=16, ch=64, filt=128, heads=2, layers=6, filt_dp=32)
DEC = dict(in_ch=32, out_ch=16, channels=(64, 64), heads=2, head_dim=32, num_mid=2)
GEN = dict(init_ch=64)


def main():
    data = {}
    torch.manual_seed(0)

    # ---------------- encoder + decoder (one combined matcha state_dict) -------
    tenc = torch_ref.TorchTextEncoder(**ENC).eval()
    tdec = torch_ref.TorchDecoder(**DEC).eval()
    for k, v in tenc.state_dict().items():
        data[f"sd/encoder.{k}"] = v.detach().numpy()
    for k, v in tdec.state_dict().items():
        data[f"sd/decoder.estimator.{k}"] = v.detach().numpy()

    rng = np.random.default_rng(0)
    b, tx = 2, 12
    x = rng.integers(3, 140, size=(b, tx)).astype(np.int64)
    xl = np.array([12, 9])
    with torch.no_grad():
        mu_t, logw_t, _ = tenc(torch.from_numpy(x), torch.from_numpy(xl))
    data["enc/x"], data["enc/xl"] = x, xl
    data["enc/mu"], data["enc/logw"] = mu_t.numpy(), logw_t.numpy()

    t, f = 16, DEC["out_ch"]
    xd = rng.standard_normal((b, f, t)).astype(np.float32)
    mu = rng.standard_normal((b, f, t)).astype(np.float32)
    mask = np.ones((b, 1, t), np.float32)
    mask[1, :, 12:] = 0.0
    tt = np.array([0.3, 0.7], np.float32)
    with torch.no_grad():
        out_t = tdec(torch.from_numpy(xd), torch.from_numpy(mask),
                     torch.from_numpy(mu), torch.from_numpy(tt))
    data["dec/x"], data["dec/mu"], data["dec/mask"], data["dec/t"] = xd, mu, mask, tt
    data["dec/out"] = out_t.numpy()

    # ---------------- hifigan generator (weight-normed, reference names) -------
    torch.manual_seed(2)
    tgen = torch_ref.TorchHiFiGenerator(**GEN)
    for m in tgen.modules():
        if isinstance(m, (torch.nn.Conv1d, torch.nn.ConvTranspose1d)):
            torch.nn.utils.weight_norm(m)
    tgen.eval()
    for k, v in tgen.state_dict().items():
        data[f"gsd/{k}"] = v.detach().numpy()
    mel = rng.standard_normal((1, 80, 6)).astype(np.float32)
    with torch.no_grad():
        wav = tgen(torch.from_numpy(mel)).numpy()[:, 0, :]
    data["gen/mel"], data["gen/wav"] = mel, wav

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **data)
    n_bytes = OUT.stat().st_size
    print(f"wrote {OUT} ({n_bytes / 1e6:.2f} MB, {len(data)} arrays)")


if __name__ == "__main__":
    main()
