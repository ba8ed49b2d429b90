"""Reference-equivalent PyTorch model used as a parity oracle in tests.

A fresh, compact PyTorch implementation of the reference MatchaTTS semantics
(`/root/reference/matcha/models/`) with STATE-DICT-COMPATIBLE parameter names, so the
matcha_tpu.compat converters can be exercised end-to-end and layer outputs compared.
Written from the documented semantics (SURVEY.md §2.3); the diffusers attention block
reproduces diffusers' additive-mask `baddbmm` behavior.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ----------------------------------------------------------------- text encoder
class Prenet(nn.Module):
    def __init__(self, ch, k=5, n_layers=3):
        super().__init__()
        self.convolutions = nn.ModuleList(
            [nn.Conv1d(ch, ch, k, padding=k // 2) for _ in range(n_layers)]
        )
        self.normalizations = nn.ModuleList([nn.LayerNorm(ch) for _ in range(n_layers)])
        self.projection = nn.Conv1d(ch, ch, 1)
        self.projection.weight.data.zero_()
        self.projection.bias.data.zero_()

    def forward(self, x, mask):
        residual = x
        for conv, norm in zip(self.convolutions, self.normalizations):
            x = conv(x * mask)
            x = norm(x.transpose(1, 2)).transpose(1, 2)
            x = torch.relu(x)
        return (residual + self.projection(x)) * mask


def rope_apply(x, rope_dim):
    """x: (B, H, T, D); rotate first rope_dim dims, GPT-NeoX pairing."""
    t = x.shape[2]
    half = rope_dim // 2
    theta = 1.0 / (10000.0 ** (torch.arange(0, rope_dim, 2).float() / rope_dim))
    pos = torch.arange(t).float()
    ang = torch.einsum("n,d->nd", pos, theta)
    ang = torch.cat([ang, ang], dim=1)  # (T, rope_dim)
    cos, sin = ang.cos()[None, None], ang.sin()[None, None]
    x_r, x_p = x[..., :rope_dim], x[..., rope_dim:]
    neg = torch.cat([-x_r[..., half:], x_r[..., :half]], dim=-1)
    x_r = x_r * cos + neg * sin
    return torch.cat([x_r, x_p], dim=-1)


class MHA(nn.Module):
    def __init__(self, ch, heads):
        super().__init__()
        self.heads = heads
        self.head_dim = ch // heads
        self.query_conv = nn.Conv1d(ch, ch, 1)
        self.key_conv = nn.Conv1d(ch, ch, 1)
        self.value_conv = nn.Conv1d(ch, ch, 1)
        self.output_conv = nn.Conv1d(ch, ch, 1)

    def forward(self, x, attn_mask):
        b, c, t = x.shape
        q = self.query_conv(x).view(b, self.heads, self.head_dim, t).transpose(2, 3)
        k = self.key_conv(x).view(b, self.heads, self.head_dim, t).transpose(2, 3)
        v = self.value_conv(x).view(b, self.heads, self.head_dim, t).transpose(2, 3)
        rd = int(self.head_dim * 0.5)
        q, k = rope_apply(q, rd), rope_apply(k, rd)
        scores = q @ k.transpose(-2, -1) / math.sqrt(self.head_dim)
        scores = scores.masked_fill(attn_mask == 0, -1e4)
        probs = torch.softmax(scores, dim=-1)
        out = probs @ v  # (b, h, t, d)
        out = out.transpose(2, 3).contiguous().view(b, c, t)
        return self.output_conv(out)


class EncFFN(nn.Module):
    def __init__(self, ch, filt, k):
        super().__init__()
        self.conv_net = nn.Sequential(
            nn.Conv1d(ch, filt, k, padding=k // 2),
            nn.ReLU(),
            nn.Dropout(0.0),
            nn.Conv1d(filt, ch, k, padding=k // 2),
            nn.Dropout(0.0),
        )

    def forward(self, x, mask):
        return self.conv_net(x * mask) * mask


class TransEncoder(nn.Module):
    def __init__(self, ch, filt, heads, layers, k):
        super().__init__()
        self.attention_layers = nn.ModuleList([MHA(ch, heads) for _ in range(layers)])
        self.norm_layers_1 = nn.ModuleList([nn.LayerNorm(ch) for _ in range(layers)])
        self.ffn_layers = nn.ModuleList([EncFFN(ch, filt, k) for _ in range(layers)])
        self.norm_layers_2 = nn.ModuleList([nn.LayerNorm(ch) for _ in range(layers)])

    def forward(self, x, mask):
        attn_mask = mask.unsqueeze(2) * mask.unsqueeze(-1)
        for attn, n1, ffn, n2 in zip(
            self.attention_layers, self.norm_layers_1, self.ffn_layers, self.norm_layers_2
        ):
            x = x * mask
            a = attn(x, attn_mask)
            x = n1((x + a).transpose(1, 2)).transpose(1, 2)
            f = ffn(x, mask)
            x = n2((x + f).transpose(1, 2)).transpose(1, 2)
        return x * mask


class DurationPredictor(nn.Module):
    def __init__(self, ch, filt, k):
        super().__init__()
        self.conv_layer_1 = nn.Conv1d(ch, filt, k, padding=k // 2)
        self.norm_layer_1 = nn.LayerNorm(filt)
        self.conv_layer_2 = nn.Conv1d(filt, filt, k, padding=k // 2)
        self.norm_layer_2 = nn.LayerNorm(filt)
        self.output_projection = nn.Conv1d(filt, 1, 1)

    def forward(self, x, mask):
        x = torch.relu(self.conv_layer_1(x * mask))
        x = self.norm_layer_1(x.transpose(1, 2)).transpose(1, 2)
        x = torch.relu(self.conv_layer_2(x * mask))
        x = self.norm_layer_2(x.transpose(1, 2)).transpose(1, 2)
        return self.output_projection(x * mask) * mask


class TorchTextEncoder(nn.Module):
    def __init__(self, n_vocab=150, n_feats=80, ch=192, filt=768, heads=2, layers=6, k=3,
                 filt_dp=256, k_dp=3):
        super().__init__()
        self.ch = ch
        self.embedding = nn.Embedding(n_vocab, ch)
        nn.init.normal_(self.embedding.weight, 0.0, ch**-0.5)
        self.prenet = Prenet(ch)
        self.encoder = TransEncoder(ch, filt, heads, layers, k)
        self.mean_projection = nn.Conv1d(ch, n_feats, 1)
        self.duration_predictor = DurationPredictor(ch, filt_dp, k_dp)

    def forward(self, x, x_lengths):
        emb = self.embedding(x) * math.sqrt(self.ch)
        emb = emb.transpose(1, 2)
        t = emb.shape[2]
        mask = (torch.arange(t)[None, :] < x_lengths[:, None]).unsqueeze(1).float()
        h = self.prenet(emb, mask)
        h = self.encoder(h, mask)
        mu = self.mean_projection(h) * mask
        logw = self.duration_predictor(h.detach(), mask)
        return mu, logw, mask


# ---------------------------------------------------------------------- decoder
class SinPosEmb(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, x, scale=1000):
        if x.ndim < 1:
            x = x.unsqueeze(0)
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half).float() * -emb)
        emb = scale * x.unsqueeze(1) * emb.unsqueeze(0)
        return torch.cat((emb.sin(), emb.cos()), dim=-1)


class TimeMLP(nn.Module):
    def __init__(self, in_ch, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_ch, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class Block1D(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.block = nn.Sequential(nn.Conv1d(i, o, 3, padding=1), nn.GroupNorm(8, o), nn.Mish())

    def forward(self, x, mask):
        return self.block(x * mask) * mask


class Resnet1D(nn.Module):
    def __init__(self, i, o, tdim):
        super().__init__()
        self.mlp = nn.Sequential(nn.Mish(), nn.Linear(tdim, o))
        self.block1 = Block1D(i, o)
        self.block2 = Block1D(o, o)
        self.res_conv = nn.Conv1d(i, o, 1)

    def forward(self, x, mask, t):
        h = self.block1(x, mask)
        h = h + self.mlp(t)[:, :, None]
        h = self.block2(h, mask)
        return h + self.res_conv(x * mask)


class DiffusersStyleTransformer(nn.Module):
    """diffusers BasicTransformerBlock (gelu config) with additive-mask quirk."""

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads = heads
        self.head_dim = head_dim
        self.norm1 = nn.LayerNorm(dim)

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.to_q = nn.Linear(dim, inner, bias=False)
                self.to_k = nn.Linear(dim, inner, bias=False)
                self.to_v = nn.Linear(dim, inner, bias=False)
                self.to_out = nn.ModuleList([nn.Linear(inner, dim)])

        self.attn1 = Attn()
        self.norm3 = nn.LayerNorm(dim)

        class FFNet(nn.Module):
            def __init__(self):
                super().__init__()

                class GeluProj(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.proj = nn.Linear(dim, dim * 4)

                    def forward(self, x):
                        return F.gelu(self.proj(x))

                self.net = nn.ModuleList([GeluProj(), nn.Dropout(0.0), nn.Linear(dim * 4, dim)])

            def forward(self, x):
                for m in self.net:
                    x = m(x)
                return x

        self.ff = FFNet()

    def forward(self, x, attn_mask):
        # x: (B, T, C); attn_mask: (B, T) 0/1 float, ADDED to logits (diffusers quirk)
        h = self.norm1(x)
        b, t, _ = h.shape
        q = self.attn1.to_q(h).view(b, t, self.heads, self.head_dim).transpose(1, 2)
        k = self.attn1.to_k(h).view(b, t, self.heads, self.head_dim).transpose(1, 2)
        v = self.attn1.to_v(h).view(b, t, self.heads, self.head_dim).transpose(1, 2)
        scores = q @ k.transpose(-2, -1) / math.sqrt(self.head_dim)
        if attn_mask is not None:
            scores = scores + attn_mask[:, None, None, :]
        probs = torch.softmax(scores, dim=-1)
        out = (probs @ v).transpose(1, 2).contiguous().view(b, t, -1)
        x = x + self.attn1.to_out[0](out)
        x = x + self.ff(self.norm3(x))
        return x


class TorchDecoder(nn.Module):
    def __init__(self, in_ch=160, out_ch=80, channels=(256, 256), heads=4, head_dim=64,
                 num_mid=2):
        super().__init__()
        tdim = channels[0] * 4
        self.time_embeddings = SinPosEmb(in_ch)
        self.time_mlp = TimeMLP(in_ch, tdim)

        self.Downsampling_Blocks = nn.ModuleList()
        out = in_ch
        for i, ch in enumerate(channels):
            is_last = i == len(channels) - 1
            res = Resnet1D(out, ch, tdim)
            out = ch
            trans = nn.ModuleList([DiffusersStyleTransformer(ch, heads, head_dim)])
            if not is_last:
                class Down(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.conv = nn.Conv1d(ch, ch, 3, 2, 1)

                    def forward(self, x):
                        return self.conv(x)

                down = Down()
            else:
                down = nn.Conv1d(ch, ch, 3, padding=1)
            self.Downsampling_Blocks.append(nn.ModuleList([res, trans, down]))

        self.Mid_Blocks = nn.ModuleList()
        for _ in range(num_mid):
            self.Mid_Blocks.append(nn.ModuleList([
                Resnet1D(channels[-1], channels[-1], tdim),
                nn.ModuleList([DiffusersStyleTransformer(channels[-1], heads, head_dim)]),
            ]))

        rev = tuple(reversed(channels)) + (channels[0],)
        self.Upsampling_Blocks = nn.ModuleList()
        for i in range(len(rev) - 1):
            is_last = i == len(rev) - 2
            res = Resnet1D(rev[i] * 2, rev[i + 1], tdim)
            trans = nn.ModuleList([DiffusersStyleTransformer(rev[i + 1], heads, head_dim)])
            if not is_last:
                class Up(nn.Module):
                    def __init__(self, c):
                        super().__init__()
                        self.conv = nn.ConvTranspose1d(c, c, 4, 2, 1)

                    def forward(self, x):
                        return self.conv(x)

                up = Up(rev[i + 1])
            else:
                up = nn.Conv1d(rev[i + 1], rev[i + 1], 3, padding=1)
            self.Upsampling_Blocks.append(nn.ModuleList([res, trans, up]))

        self.final_conv = nn.Conv1d(channels[0], channels[0], 3, padding=1)
        self.final_norm = nn.GroupNorm(8, channels[0])
        self.final_proj = nn.Conv1d(channels[0], out_ch, 1)

    def forward(self, x, mask, mu, t):
        t = self.time_mlp(self.time_embeddings(t))
        x = torch.cat([x, mu], dim=1)
        hiddens, masks = [], [mask]
        for res, trans, down in self.Downsampling_Blocks:
            m = masks[-1]
            x = res(x, m, t)
            x2 = x.transpose(1, 2)
            for tb in trans:
                x2 = tb(x2, m[:, 0, :])
            x = x2.transpose(1, 2)
            hiddens.append(x)
            x = down(x * m)
            new_size = (m.shape[-1] + 1) // 2 if hasattr(down, "conv") and down.conv.stride[0] == 2 else m.shape[-1]
            masks.append(m[:, :, :new_size])
        masks = masks[:-1]
        m = masks[-1]
        for res, trans in self.Mid_Blocks:
            x = res(x, m, t)
            x2 = x.transpose(1, 2)
            for tb in trans:
                x2 = tb(x2, m[:, 0, :])
            x = x2.transpose(1, 2)
        for res, trans, up in self.Upsampling_Blocks:
            m = masks.pop()
            hidden = hiddens.pop()
            if x.shape[-1] != hidden.shape[-1]:
                x = F.interpolate(x, size=hidden.shape[-1], mode="nearest")
            x = torch.cat([x, hidden], dim=1)
            x = res(x, m, t)
            x2 = x.transpose(1, 2)
            for tb in trans:
                x2 = tb(x2, m[:, 0, :])
            x = x2.transpose(1, 2)
            x = up(x * m)
            if x.shape[-1] > m.shape[-1]:
                m = F.interpolate(m, size=x.shape[-1], mode="nearest")
            else:
                m = m[:, :, : x.shape[-1]]
        x = self.final_conv(x * m)
        x = F.mish(self.final_norm(x))
        out = self.final_proj(x * m)
        return out * mask


class TorchMatcha(nn.Module):
    """Container matching the reference state_dict layout (encoder.*, decoder.estimator.*)."""

    def __init__(self, **kw):
        super().__init__()
        self.encoder = TorchTextEncoder(**{k: v for k, v in kw.items() if k.startswith(("n_", "ch"))})

        class CFMWrap(nn.Module):
            def __init__(self):
                super().__init__()
                self.estimator = TorchDecoder()

        self.decoder = CFMWrap()


# ------------------------------------------------------- full synthesise chain
def torch_sequence_mask(lengths, max_length):
    return torch.arange(max_length)[None, :] < lengths[:, None]


def torch_fix_len_compatibility(length, num_downsamplings=2):
    """Round up to a multiple of 2**num_downsamplings (`matcha/utils/model.py:37`)."""
    factor = 2**num_downsamplings
    return int(math.ceil(length / factor) * factor)


def torch_generate_path(duration, mask):
    """Duration -> 0/1 monotone path (`matcha/utils/model.py:77`).

    duration: (B, Tx) float frame counts; mask: (B, Tx, Ty).
    """
    b, t_x, t_y = mask.shape
    cum = torch.cumsum(duration, -1)
    frames = torch.arange(t_y)
    cum_mask = (frames[None, None, :] < cum[:, :, None]).float()
    path = cum_mask - F.pad(cum_mask, (0, 0, 1, 0))[:, :-1, :]
    return path * mask


def torch_synthesise(encoder, estimator, x, x_lengths, n_timesteps, z,
                     temperature=1.0, length_scale=1.0, y_max_length_=None,
                     solver="euler"):
    """Reference `MatchaTTS.synthesise` semantics with injected pre-temperature noise.

    Reproduces the full inference chain of `matcha/models/matcha_tts.py:179-245`
    (w = exp(logw)*mask, w_ceil = ceil(w) * length_scale APPLIED AFTER CEIL,
    y_lengths = clamp_min(sum w_ceil, 1), pad to a multiple of 4, generate_path,
    mu_y = attn^T mu_x) followed by the Euler ODE loop of
    `flow_matching.py:67-104` (t_span = linspace(0, 1, n+1), x <- x + dt*v).

    z: (B, n_feats, T_pad) standard-normal noise, multiplied by `temperature` here
    exactly as `flow_matching.py:60` does. `y_max_length_` optionally pins the
    padded frame budget (must be >= fix_len_compatibility(max y_length) and a
    multiple of 4); defaults to the data-derived reference value.

    Returns dict with UNCROPPED (T_pad) outputs so shapes match the static-budget
    JAX side; padding frames of `decoder_outputs` hold raw noise (the reference
    never masks the running ODE state — only the estimator output is masked), so
    comparisons must apply `y_mask`.
    """
    with torch.no_grad():
        mu_x, logw, x_mask = encoder(x, x_lengths)
        w = torch.exp(logw) * x_mask
        w_ceil = torch.ceil(w) * length_scale
        y_lengths = torch.clamp_min(torch.sum(w_ceil, [1, 2]), 1).long()
        y_max_length = int(y_lengths.max())
        if y_max_length_ is None:
            y_max_length_ = torch_fix_len_compatibility(y_max_length)
        assert y_max_length_ % 4 == 0
        # serving-side budget clamp (matcha_tpu models/matcha.py decode_fixed):
        # predicted lengths exceeding the static budget are truncated — the
        # reference never hits this (it always pads up), the engine does
        y_lengths = torch.clamp_max(y_lengths, y_max_length_)

        y_mask = torch_sequence_mask(y_lengths, y_max_length_).unsqueeze(1).to(x_mask.dtype)
        attn_mask = x_mask.unsqueeze(-1) * y_mask.unsqueeze(2)
        attn = torch_generate_path(w_ceil.squeeze(1), attn_mask.squeeze(1))
        mu_y = torch.matmul(attn.transpose(1, 2), mu_x.transpose(1, 2)).transpose(1, 2)

        assert z.shape == mu_y.shape
        xcur = z * temperature
        t_span = torch.linspace(0, 1, n_timesteps + 1)
        t = t_span[0]
        dt = t_span[1] - t_span[0]
        for step in range(1, len(t_span)):
            tb = torch.full((xcur.shape[0],), float(t))
            if solver == "midpoint":
                # RK2, matching matcha_tpu.flow.solve_midpoint exactly
                v1 = estimator(xcur, y_mask, mu_y, tb)
                xm = xcur + 0.5 * dt * v1
                v = estimator(xm, y_mask, mu_y,
                              torch.full((xcur.shape[0],), float(t + 0.5 * dt)))
            else:
                v = estimator(xcur, y_mask, mu_y, tb)
            xcur = xcur + dt * v
            t = t + dt
            if step < len(t_span) - 1:
                dt = t_span[step + 1] - t

        return {
            "encoder_outputs": mu_y,
            "decoder_outputs": xcur,
            "attn": attn,
            "y_mask": y_mask,
            "mel_lengths": y_lengths,
            "y_max_length_": y_max_length_,
        }


# ---------------------------------------------------------------------- hifigan
class TorchResBlock1(nn.Module):
    def __init__(self, ch, k, dilations=(1, 3, 5)):
        super().__init__()
        self.convs1 = nn.ModuleList(
            [nn.Conv1d(ch, ch, k, dilation=d, padding=(k * d - d) // 2) for d in dilations]
        )
        self.convs2 = nn.ModuleList(
            [nn.Conv1d(ch, ch, k, dilation=1, padding=(k - 1) // 2) for _ in dilations]
        )

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = F.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = F.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = xt + x
        return x


class TorchHiFiGenerator(nn.Module):
    """Reference-named HiFi-GAN v1 generator (conv_pre/ups/resblocks/conv_post)."""

    def __init__(self, rates=(8, 8, 2, 2), kernels=(16, 16, 4, 4), init_ch=512,
                 res_ks=(3, 7, 11), res_ds=((1, 3, 5),) * 3):
        super().__init__()
        self.num_kernels = len(res_ks)
        self.conv_pre = nn.Conv1d(80, init_ch, 7, 1, padding=3)
        self.ups = nn.ModuleList()
        for i, (u, k) in enumerate(zip(rates, kernels)):
            self.ups.append(
                nn.ConvTranspose1d(init_ch // (2**i), init_ch // (2 ** (i + 1)), k, u,
                                   padding=(k - u) // 2)
            )
        self.resblocks = nn.ModuleList()
        for i in range(len(self.ups)):
            ch = init_ch // (2 ** (i + 1))
            for k, d in zip(res_ks, res_ds):
                self.resblocks.append(TorchResBlock1(ch, k, d))
        self.conv_post = nn.Conv1d(ch, 1, 7, 1, padding=3)

    def forward(self, x):
        x = self.conv_pre(x)
        for i in range(len(self.ups)):
            x = F.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            xs = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / self.num_kernels
        x = F.leaky_relu(x)
        x = self.conv_post(x)
        return torch.tanh(x)
