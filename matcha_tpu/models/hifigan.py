"""HiFi-GAN v1 vocoder (flax.linen, feature-last layout).

TPU-native reimplementation of the reference vocoder package
(`/root/reference/hifi_gan/models.py`): the Generator (conv k7 pre -> 4x [leaky-relu,
ConvTranspose upsample, multi-receptive-field fusion of 3 ResBlocks] -> leaky-relu ->
conv k7 post -> tanh) plus the MultiPeriod/MultiScale discriminators and GAN losses used
for vocoder training.

The generator is inference-normalized (weight norm folded into the kernels, matching the
reference's `remove_weight_norm()` deployment path, `models.py:118-125`); training-time
weight normalization is provided via the `weight_norm` flag.

Every conv maps to `lax.conv_general_dilated` / `lax.conv_transpose` on the MXU; the MRF
residual stacks are pure elementwise+conv chains that XLA fuses.
"""

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class HiFiGANConfig:
    """Generator v1 hyperparameters (`/root/reference/checkpts/config.json`)."""

    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 80
    sampling_rate: int = 22050


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def _lrelu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def _norm_init():
    # Reference init_weights: normal(0, 0.01) (`hifi_gan/utils.py:23-26`)
    return nn.initializers.normal(stddev=0.01)


class WNConv(nn.Module):
    """Conv1d with optional weight normalization (training parity)."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        pad = _get_padding(self.kernel_size, self.dilation)
        conv = nn.Conv(
            self.features,
            (self.kernel_size,),
            strides=(self.stride,),
            padding=[(pad, pad)],
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            kernel_init=_norm_init(),
        )
        if not self.weight_norm:
            return conv(x)
        return nn.WeightNorm(conv)(x)


class SubpixelConvTranspose(nn.Module):
    """Stride-u transposed conv computed as ONE dense conv + channel->time reshape.

    XLA lowers `conv_transpose` by zero-dilating the input, so the MXU spends
    (u-1)/u of its multiplies on stuffed zeros (for the HiFi-GAN v1 8x stages,
    7/8 of that layer's work). The identity used here instead: with torch padding
    p = (k-u)//2 (the HiFi-GAN geometry, `models.py:84-88`), output phase
    r in [0,u) is a short correlation over the UN-upsampled sequence,

        y[u*t + r] = sum_a x[t + d_r - a] . W[:, :, u*a + rho_r],
        rho_r = (r + p) mod u,  d_r = (r + p) // u,

    i.e. one dense conv producing u*C_out channels from a window of
    ceil(k/u)+1 input frames, then a (B, T, u, C) -> (B, u*T, C) reshape.
    Same math, 1/u of the MXU work, and a contraction dim u times fatter.

    Declares the SAME parameter layout as flax nn.ConvTranspose with
    transpose_kernel=True (kernel (k, C_out, C_in) + bias) so checkpoints and
    the torch converter (`compat/torch_import.py:38-40`) are interchangeable;
    the kernel regrouping is traced (tiny gathers, constant-folded by XLA).
    """

    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        u, k, co = self.stride, self.kernel_size, self.features
        ci = x.shape[-1]
        kernel = self.param("kernel", _norm_init(), (k, co, ci))
        bias = self.param("bias", nn.initializers.zeros_init(), (co,))
        p_t = (k - u) // 2  # torch ConvTranspose1d padding (reference geometry)
        offsets: dict = {}  # window offset -> [(kernel tap j, output phase r)]
        for r in range(u):
            rho, delta = (r + p_t) % u, (r + p_t) // u
            a = 0
            while u * a + rho < k:
                offsets.setdefault(delta - a, []).append((u * a + rho, r))
                a += 1
        w_min, w_max = min(offsets), max(offsets)
        regroup = jnp.zeros((w_max - w_min + 1, ci, u, co), kernel.dtype)
        for off, taps in offsets.items():
            for j, r in taps:
                regroup = regroup.at[off - w_min, :, r, :].set(
                    jnp.swapaxes(kernel[j], 0, 1))
        y = jax.lax.conv_general_dilated(
            x, regroup.reshape(w_max - w_min + 1, ci, u * co),
            window_strides=(1,), padding=[(-w_min, w_max)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = y.reshape(x.shape[0], x.shape[1] * u, co)
        return y + bias


class _RawConvParams(nn.Module):
    """Declares a flax nn.Conv's parameters (kernel + bias) without running the
    conv — named "Conv_0" inside a _RawWNConv shell, this reproduces WNConv's
    exact parameter tree so Pallas-computed blocks stay checkpoint-compatible."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", _norm_init(),
                            (self.kernel_size, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class _RawWNConv(nn.Module):
    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_features: int):
        return _RawConvParams(self.features, self.kernel_size,
                              name="Conv_0")(in_features)


class ResBlock1(nn.Module):
    """Dilated residual MRF block (`models.py:11-48`).

    `impl="pallas"` (inference only): each dilation step runs as one
    VMEM-resident fused kernel (ops/mrf_pallas.py) instead of ~5 HBM traversals
    — same parameter tree (declared via _RawWNConv shells), same math."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    weight_norm: bool = False
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        if self.impl == "pallas" and not self.weight_norm:
            from matcha_tpu.ops import mrf_pallas

            assert mrf_pallas.LRELU_SLOPE == LRELU_SLOPE
            ci = x.shape[-1]
            for i, d in enumerate(self.dilations):
                w1, b1 = _RawWNConv(self.channels, self.kernel_size,
                                    name=f"WNConv_{2 * i}")(ci)
                w2, b2 = _RawWNConv(self.channels, self.kernel_size,
                                    name=f"WNConv_{2 * i + 1}")(self.channels)
                out = mrf_pallas.fused_mrf_step(x, w1, b1, w2, b2, dilation=d)
                if out is None:  # no viable time tiling: XLA fallback
                    xt = _lrelu(x)
                    xt = jax.lax.conv_general_dilated(
                        xt, w1, (1,), [(d * (self.kernel_size - 1) // 2,) * 2],
                        rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"),
                    ) + b1
                    xt = _lrelu(xt)
                    xt = jax.lax.conv_general_dilated(
                        xt, w2, (1,), [((self.kernel_size - 1) // 2,) * 2],
                        dimension_numbers=("NWC", "WIO", "NWC"),
                    ) + b2
                    out = x + xt
                x = out
            return x
        for d in self.dilations:
            xt = _lrelu(x)
            xt = WNConv(self.channels, self.kernel_size, dilation=d, weight_norm=self.weight_norm)(xt)
            xt = _lrelu(xt)
            xt = WNConv(self.channels, self.kernel_size, dilation=1, weight_norm=self.weight_norm)(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """Two-conv residual block variant (`models.py:51-73`)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3)
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        for d in self.dilations:
            xt = _lrelu(x)
            xt = WNConv(self.channels, self.kernel_size, dilation=d, weight_norm=self.weight_norm)(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    """mel (B, T, 80) -> waveform (B, T * prod(upsample_rates)) (`models.py:75-116`)."""

    cfg: HiFiGANConfig = HiFiGANConfig()
    weight_norm: bool = False
    # "conv_transpose" (reference lowering) or "subpixel" (same parameters/math,
    # 1/u of the upsample MXU work — see SubpixelConvTranspose). Inference only:
    # the weight-norm training path keeps the flax module WeightNorm wraps.
    upsample_impl: str = "conv_transpose"
    # "xla" or "pallas": run each MRF dilation step as a fused VMEM kernel
    # (ops/mrf_pallas.py) — the measured vocoder bottleneck is HBM traffic of
    # the resblock elementwise chains (docs/DESIGN.md). Inference only.
    resblock_impl: str = "xla"

    @nn.compact
    def __call__(self, mel):
        cfg = self.cfg
        num_kernels = len(cfg.resblock_kernel_sizes)
        res_cls = ResBlock1 if cfg.resblock == "1" else ResBlock2
        # Training parity: the reference weight-norms every generator conv
        # (`models.py:80-106`); inference folds the norm into the kernels.
        wn = nn.WeightNorm if self.weight_norm else (lambda m: m)

        x = wn(nn.Conv(
            cfg.upsample_initial_channel, (7,), padding=[(3, 3)], kernel_init=_norm_init(),
            name="conv_pre",
        ))(mel)

        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = _lrelu(x)
            if self.upsample_impl == "subpixel" and not self.weight_norm:
                x = SubpixelConvTranspose(ch, k, u, name=f"up_{i}")(x)
            else:
                # torch ConvTranspose1d(k, stride=u, padding=(k-u)//2) -> output u*T.
                # flax pads the stride-dilated input directly, so torch padding p maps
                # to flax padding k-1-p on both sides.
                p = k - 1 - (k - u) // 2
                x = wn(nn.ConvTranspose(
                    ch, (k,), strides=(u,), padding=[(p, p)], transpose_kernel=True,
                    kernel_init=_norm_init(), name=f"up_{i}",
                ))(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                if res_cls is ResBlock1:
                    y = ResBlock1(ch, rk, tuple(rd), self.weight_norm,
                                  self.resblock_impl, name=f"res_{i}_{j}")(x)
                else:
                    y = res_cls(ch, rk, tuple(rd), self.weight_norm,
                                name=f"res_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / num_kernels

        # Reference quirk: the final leaky_relu uses torch's DEFAULT slope 0.01,
        # not LRELU_SLOPE (`models.py:111` calls F.leaky_relu with no slope arg).
        x = jax.nn.leaky_relu(x, 0.01)
        x = wn(nn.Conv(1, (7,), padding=[(3, 3)], kernel_init=_norm_init(), name="conv_post"))(x)
        return jnp.tanh(x)[..., 0]


def fold_weight_norm(params):
    """Fold WeightNorm scales into plain kernels for inference deployment.

    Parity of the reference's `remove_weight_norm()` (`hifi_gan/models.py:118-125`):
    maps a `Generator(weight_norm=True)` parameter tree (as trained by
    matcha_tpu.train.vocoder.VocoderTrainer) onto the `Generator(weight_norm=False)`
    layout. flax `nn.WeightNorm` stores the direction kernel v at the wrapped conv's
    own path and a per-feature `'<path>/kernel/scale'` entry in a sibling
    `WeightNorm_*` scope; the folded kernel is

        w = scale * v / ||v||   (L2 norm over all non-feature axes, per output
                                 feature — flax feature_axes=-1 semantics)

    and the WeightNorm scopes are dropped.
    """
    from collections.abc import Mapping

    def fold(node):
        if not isinstance(node, Mapping):
            return node
        out = {k: fold(v) for k, v in node.items() if not k.startswith("WeightNorm_")}
        for k, wn_scope in node.items():
            if not k.startswith("WeightNorm_"):
                continue
            for name, scale in wn_scope.items():
                parts = name.split("/")  # e.g. 'conv_pre/kernel/scale'
                if parts[-1] != "scale":
                    raise ValueError(f"unexpected WeightNorm entry: {name}")
                tgt = out
                for p in parts[:-2]:
                    tgt = tgt[p]
                v = tgt[parts[-2]]
                # exact flax semantics: v * rsqrt(sum(v^2) + eps), eps = 1e-12
                norm = jnp.sqrt(
                    jnp.sum(jnp.square(v.astype(jnp.float32)),
                            axis=tuple(range(v.ndim - 1)), keepdims=True) + 1e-12
                )
                tgt[parts[-2]] = (v.astype(jnp.float32) * (scale.astype(jnp.float32) / norm)).astype(v.dtype)
        return out

    return fold(params)


# --------------------------------------------------------------------------- #
# Discriminators (vocoder training; inference-unused in the reference as well)
# --------------------------------------------------------------------------- #


class DiscriminatorP(nn.Module):
    """Period discriminator (`models.py:128-166`): fold waveform into (T/p, p) 2-D map."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    channels: Tuple[int, ...] = (32, 128, 512, 1024)  # configurable for tiny tests

    @nn.compact
    def __call__(self, x):
        # x: (B, T)
        b, t = x.shape
        p = self.period
        n_pad = (p - t % p) % p
        if n_pad:
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // p, p, 1)  # (B, H, W, C) feature-last

        fmap = []
        pad = _get_padding(5, 1)
        for ch in self.channels:
            x = nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                        padding=[(pad, pad), (0, 0)], kernel_init=_norm_init())(x)
            x = _lrelu(x)
            fmap.append(x)
        x = nn.Conv(self.channels[-1], (self.kernel_size, 1), padding=[(2, 2), (0, 0)],
                    kernel_init=_norm_init())(x)
        x = _lrelu(x)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)], kernel_init=_norm_init())(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


_MSD_SPEC = (
    (128, 15, 1, 1, 7), (128, 41, 2, 4, 20), (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20), (1024, 41, 4, 16, 20), (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
)


class DiscriminatorS(nn.Module):
    """Scale discriminator (`models.py:191-216`): grouped 1-D conv stack.

    `spec` rows are (channels, kernel, stride, groups, pad); default = reference v1.
    """

    spec: Tuple[Tuple[int, int, int, int, int], ...] = _MSD_SPEC

    @nn.compact
    def __call__(self, x):
        # x: (B, T) -> (B, T, 1)
        b = x.shape[0]
        x = x[:, :, None]
        fmap = []
        for ch, k, s, g, pad in self.spec:
            x = nn.Conv(ch, (k,), strides=(s,), padding=[(pad, pad)],
                        feature_group_count=g, kernel_init=_norm_init())(x)
            x = _lrelu(x)
            fmap.append(x)
        x = nn.Conv(1, (3,), padding=[(1, 1)], kernel_init=_norm_init())(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """Periods 2,3,5,7,11 (`models.py:169-188`)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channels: Tuple[int, ...] = (32, 128, 512, 1024)

    @nn.compact
    def __call__(self, y, y_hat):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p, channels=self.channels, name=f"p{p}")
            o_r, f_r = d(y)
            o_g, f_g = d(y_hat)
            outs_r.append(o_r)
            outs_g.append(o_g)
            fmaps_r.append(f_r)
            fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


class MultiScaleDiscriminator(nn.Module):
    """Three scales with avg-pool downsampling (`models.py:219-248`)."""

    spec: Tuple[Tuple[int, int, int, int, int], ...] = _MSD_SPEC

    @nn.compact
    def __call__(self, y, y_hat):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for i in range(3):
            if i != 0:
                y = nn.avg_pool(y[:, :, None], (4,), strides=(2,), padding=[(2, 2)])[:, :, 0]
                y_hat = nn.avg_pool(y_hat[:, :, None], (4,), strides=(2,), padding=[(2, 2)])[:, :, 0]
            d = DiscriminatorS(spec=self.spec, name=f"s{i}")
            o_r, f_r = d(y)
            o_g, f_g = d(y_hat)
            outs_r.append(o_r)
            outs_g.append(o_g)
            fmaps_r.append(f_r)
            fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


# ------------------------------------------------------------------ GAN losses
def feature_loss(fmap_r, fmap_g):
    """L1 feature-matching loss x2 (`models.py:251-257`)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2


def discriminator_loss(disc_real, disc_gen):
    """LSGAN discriminator loss (`models.py:260-272`)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r = jnp.mean((1 - dr) ** 2)
        g = jnp.mean(dg**2)
        loss += r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LSGAN generator loss (`models.py:275-283`)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
