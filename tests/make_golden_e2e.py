"""Generate the frozen FULL-SIZE end-to-end synthesise fixture
(`tests/fixtures/golden_e2e.npz`).

Run manually (requires torch):  python -m tests.make_golden_e2e

Complements tests/make_golden_fixtures.py (reduced-width per-layer fixtures):
this one freezes the complete inference chain at the DEFAULT reference
hyperparameters (192-ch encoder, (256,256)-ch U-Net, `matcha_tts.py:123-158`) so
full-width conversion and the composed duration->path->ODE quirks are pinned
without torch at test time. Weights are regenerated deterministically from numpy
seeds (tests/golden_utils.py) — only the (key, shape) spec, inputs, injected
noise, and expected outputs are frozen.
"""

import pathlib

import numpy as np
import torch

from tests import torch_ref
from tests.golden_utils import GOLDEN_E2E_SEED, synth_state_dict

FIXDIR = pathlib.Path(__file__).parent / "fixtures"

# (filename, solver, n_timesteps, temperature, length_scale): the euler case is
# the original r3 golden; the midpoint/length-scale case freezes the r4 parity
# envelope (RK2 solver registry + scale-after-ceil at a non-unit scale) without
# torch at test time.
CASES = [
    ("golden_e2e.npz", "euler", 4, 0.667, 1.0),
    ("golden_e2e_midpoint.npz", "midpoint", 3, 0.667, 1.5),
]


def generate(out_name, solver, n_timesteps, temperature, length_scale):
    tenc = torch_ref.TorchTextEncoder().eval()
    tdec = torch_ref.TorchDecoder().eval()

    spec = {f"encoder.{k}": tuple(v.shape) for k, v in tenc.state_dict().items()}
    spec.update(
        {f"decoder.estimator.{k}": tuple(v.shape) for k, v in tdec.state_dict().items()}
    )
    sd = synth_state_dict(spec)
    tenc.load_state_dict(
        {k[len("encoder."):]: torch.from_numpy(v) for k, v in sd.items()
         if k.startswith("encoder.")}
    )
    tdec.load_state_dict(
        {k[len("decoder.estimator."):]: torch.from_numpy(v) for k, v in sd.items()
         if k.startswith("decoder.estimator.")}
    )

    rng = np.random.default_rng(GOLDEN_E2E_SEED + 1)
    b, tx = 2, 20
    x = rng.integers(3, 140, size=(b, tx)).astype(np.int64)
    xl = np.array([20, 13])
    x[1, 13:] = 0

    xt, xlt = torch.from_numpy(x), torch.from_numpy(xl)
    with torch.no_grad():
        _, logw, x_mask = tenc(xt, xlt)
    w_ceil = torch.ceil(torch.exp(logw) * x_mask) * length_scale
    y_lengths = torch.clamp_min(torch.sum(w_ceil, [1, 2]), 1).long()
    y_max_length_ = torch_ref.torch_fix_len_compatibility(int(y_lengths.max()))
    z = rng.standard_normal((b, 80, y_max_length_)).astype(np.float32)

    out = torch_ref.torch_synthesise(
        tenc, tdec, xt, xlt, n_timesteps, torch.from_numpy(z),
        temperature=temperature, length_scale=length_scale,
        y_max_length_=y_max_length_, solver=solver,
    )
    mask = out["y_mask"].numpy()

    data = {f"spec/{k}": np.asarray(v, np.int64) for k, v in spec.items()}
    data.update(
        x=x, xl=xl, z=z,
        solver=np.asarray(solver),
        y_max_length=np.int64(y_max_length_),
        n_timesteps=np.int64(n_timesteps),
        temperature=np.float64(temperature),
        length_scale=np.float64(length_scale),
        mel_lengths=out["mel_lengths"].numpy(),
        attn=out["attn"].numpy(),
        mu_y_masked=(out["encoder_outputs"].numpy() * mask).astype(np.float32),
        mel_masked=(out["decoder_outputs"].numpy() * mask).astype(np.float32),
    )
    out_path = FIXDIR / out_name
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_path, **data)
    print(f"wrote {out_path} ({out_path.stat().st_size / 1e6:.2f} MB, "
          f"budget {y_max_length_} frames, y_lengths {out['mel_lengths'].tolist()})")


def main():
    for case in CASES:
        generate(*case)


if __name__ == "__main__":
    main()
