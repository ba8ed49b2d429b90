"""PyTorch checkpoint -> JAX parameter-tree converters.

One-way converters for the reference's released weights so a user of the reference can
load them here (SURVEY.md §5 checkpoint notes):

  * `load_matcha_torch_checkpoint`: Lightning `.ckpt` of the reference MatchaTTS
    (`/root/reference/matcha/models/matcha_tts.py`) -> flax params for
    matcha_tpu.models.matcha.MatchaTTS;
  * `load_hifigan_torch_checkpoint`: released `generator_v1` (weight-normed) ->
    flax params for matcha_tpu.models.hifigan.Generator (weight norm folded, matching
    `remove_weight_norm()` semantics).

Tensor layout transforms:
    torch Linear (out, in)            -> flax Dense kernel (in, out)
    torch Conv1d (out, in, k)         -> flax Conv kernel (k, in, out)
    torch Conv1d 1x1 (out, in, 1)     -> flax Dense kernel (in, out)
    torch ConvTranspose1d (in, out, k)-> flax ConvTranspose(transpose_kernel=True)
                                         kernel (k, out, in)
"""

from typing import Dict

import numpy as np


def _t_linear(w):
    return np.asarray(w).T


def _t_conv(w):
    return np.asarray(w).transpose(2, 1, 0)


def _t_conv1x1(w):
    return np.asarray(w)[:, :, 0].T


def _t_convtranspose(w):
    # torch (in, out, k) -> flax transpose_kernel kernel (k, out, in)
    return np.asarray(w).transpose(2, 1, 0)


def _load_state_dict(path):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def _basic_transformer_params(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """diffusers BasicTransformerBlock -> matcha_tpu BasicTransformerBlock params."""
    return {
        "LayerNorm_0": {
            "scale": sd[f"{prefix}.norm1.weight"],
            "bias": sd[f"{prefix}.norm1.bias"],
        },
        "DiffusersAttention_0": {
            "to_q": {"kernel": _t_linear(sd[f"{prefix}.attn1.to_q.weight"])},
            "to_k": {"kernel": _t_linear(sd[f"{prefix}.attn1.to_k.weight"])},
            "to_v": {"kernel": _t_linear(sd[f"{prefix}.attn1.to_v.weight"])},
            "to_out": {
                "kernel": _t_linear(sd[f"{prefix}.attn1.to_out.0.weight"]),
                "bias": sd[f"{prefix}.attn1.to_out.0.bias"],
            },
        },
        "LayerNorm_1": {
            "scale": sd[f"{prefix}.norm3.weight"],
            "bias": sd[f"{prefix}.norm3.bias"],
        },
        "FeedForward_0": {
            "Dense_0": {
                "kernel": _t_linear(sd[f"{prefix}.ff.net.0.proj.weight"]),
                "bias": sd[f"{prefix}.ff.net.0.proj.bias"],
            },
            "Dense_1": {
                "kernel": _t_linear(sd[f"{prefix}.ff.net.2.weight"]),
                "bias": sd[f"{prefix}.ff.net.2.bias"],
            },
        },
    }


def _resnet_params(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """reference Resnet1D -> matcha_tpu ResnetBlock1D params."""
    return {
        "Block1D_0": {
            "Conv_0": {
                "kernel": _t_conv(sd[f"{prefix}.block1.block.0.weight"]),
                "bias": sd[f"{prefix}.block1.block.0.bias"],
            },
            "GroupNorm_0": {
                "scale": sd[f"{prefix}.block1.block.1.weight"],
                "bias": sd[f"{prefix}.block1.block.1.bias"],
            },
        },
        "Dense_0": {
            "kernel": _t_linear(sd[f"{prefix}.mlp.1.weight"]),
            "bias": sd[f"{prefix}.mlp.1.bias"],
        },
        "Block1D_1": {
            "Conv_0": {
                "kernel": _t_conv(sd[f"{prefix}.block2.block.0.weight"]),
                "bias": sd[f"{prefix}.block2.block.0.bias"],
            },
            "GroupNorm_0": {
                "scale": sd[f"{prefix}.block2.block.1.weight"],
                "bias": sd[f"{prefix}.block2.block.1.bias"],
            },
        },
        "Conv_0": {
            "kernel": _t_conv(sd[f"{prefix}.res_conv.weight"]),
            "bias": sd[f"{prefix}.res_conv.bias"],
        },
    }


def convert_matcha_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Reference MatchaTTS state_dict -> flax params tree (reference default config)."""
    enc = {}
    enc["Embed_0"] = {"embedding": sd["encoder.embedding.weight"]}

    prenet = {}
    for i in range(3):
        prenet[f"Conv_{i}"] = {
            "kernel": _t_conv(sd[f"encoder.prenet.convolutions.{i}.weight"]),
            "bias": sd[f"encoder.prenet.convolutions.{i}.bias"],
        }
        prenet[f"LayerNorm_{i}"] = {
            "scale": sd[f"encoder.prenet.normalizations.{i}.weight"],
            "bias": sd[f"encoder.prenet.normalizations.{i}.bias"],
        }
    prenet["Dense_0"] = {
        "kernel": _t_conv1x1(sd["encoder.prenet.projection.weight"]),
        "bias": sd["encoder.prenet.projection.bias"],
    }
    enc["ConvReluNorm_0"] = prenet

    trans = {}
    n_layers = 6
    for i in range(n_layers):
        a = f"encoder.encoder.attention_layers.{i}"
        trans[f"RoPEMultiHeadAttention_{i}"] = {
            "query": {"kernel": _t_conv1x1(sd[f"{a}.query_conv.weight"]),
                      "bias": sd[f"{a}.query_conv.bias"]},
            "key": {"kernel": _t_conv1x1(sd[f"{a}.key_conv.weight"]),
                    "bias": sd[f"{a}.key_conv.bias"]},
            "value": {"kernel": _t_conv1x1(sd[f"{a}.value_conv.weight"]),
                      "bias": sd[f"{a}.value_conv.bias"]},
            "out": {"kernel": _t_conv1x1(sd[f"{a}.output_conv.weight"]),
                    "bias": sd[f"{a}.output_conv.bias"]},
        }
        trans[f"LayerNorm_{2 * i}"] = {
            "scale": sd[f"encoder.encoder.norm_layers_1.{i}.weight"],
            "bias": sd[f"encoder.encoder.norm_layers_1.{i}.bias"],
        }
        f = f"encoder.encoder.ffn_layers.{i}.conv_net"
        trans[f"ConvFFN_{i}"] = {
            "Conv_0": {"kernel": _t_conv(sd[f"{f}.0.weight"]), "bias": sd[f"{f}.0.bias"]},
            "Conv_1": {"kernel": _t_conv(sd[f"{f}.3.weight"]), "bias": sd[f"{f}.3.bias"]},
        }
        trans[f"LayerNorm_{2 * i + 1}"] = {
            "scale": sd[f"encoder.encoder.norm_layers_2.{i}.weight"],
            "bias": sd[f"encoder.encoder.norm_layers_2.{i}.bias"],
        }
    enc["TransformerEncoder_0"] = trans

    enc["mean_projection"] = {
        "kernel": _t_conv1x1(sd["encoder.mean_projection.weight"]),
        "bias": sd["encoder.mean_projection.bias"],
    }
    dp = "encoder.duration_predictor"
    enc["DurationPredictor_0"] = {
        "Conv_0": {"kernel": _t_conv(sd[f"{dp}.conv_layer_1.weight"]),
                   "bias": sd[f"{dp}.conv_layer_1.bias"]},
        "LayerNorm_0": {"scale": sd[f"{dp}.norm_layer_1.weight"],
                        "bias": sd[f"{dp}.norm_layer_1.bias"]},
        "Conv_1": {"kernel": _t_conv(sd[f"{dp}.conv_layer_2.weight"]),
                   "bias": sd[f"{dp}.conv_layer_2.bias"]},
        "LayerNorm_1": {"scale": sd[f"{dp}.norm_layer_2.weight"],
                        "bias": sd[f"{dp}.norm_layer_2.bias"]},
        "Dense_0": {"kernel": _t_conv1x1(sd[f"{dp}.output_projection.weight"]),
                    "bias": sd[f"{dp}.output_projection.bias"]},
    }

    # --- decoder (estimator U-Net) ---------------------------------------
    est = "decoder.estimator"
    dec = {}
    dec["TimestepEmbedding_0"] = {
        "Dense_0": {"kernel": _t_linear(sd[f"{est}.time_mlp.linear_1.weight"]),
                    "bias": sd[f"{est}.time_mlp.linear_1.bias"]},
        "Dense_1": {"kernel": _t_linear(sd[f"{est}.time_mlp.linear_2.weight"]),
                    "bias": sd[f"{est}.time_mlp.linear_2.bias"]},
    }

    res_i = 0
    trn_i = 0
    # down blocks (2): resnet, transformer, downsample/conv
    for i in range(2):
        p = f"{est}.Downsampling_Blocks.{i}"
        dec[f"ResnetBlock1D_{res_i}"] = _resnet_params(sd, f"{p}.0")
        res_i += 1
        dec[f"BasicTransformerBlock_{trn_i}"] = _basic_transformer_params(sd, f"{p}.1.0")
        trn_i += 1
        if i == 0:
            dec["Downsample1D_0"] = {
                "Conv_0": {"kernel": _t_conv(sd[f"{p}.2.conv.weight"]),
                           "bias": sd[f"{p}.2.conv.bias"]},
            }
        else:
            dec["Conv_0"] = {"kernel": _t_conv(sd[f"{p}.2.weight"]),
                             "bias": sd[f"{p}.2.bias"]}
    # mid blocks (2)
    for i in range(2):
        p = f"{est}.Mid_Blocks.{i}"
        dec[f"ResnetBlock1D_{res_i}"] = _resnet_params(sd, f"{p}.0")
        res_i += 1
        dec[f"BasicTransformerBlock_{trn_i}"] = _basic_transformer_params(sd, f"{p}.1.0")
        trn_i += 1
    # up blocks (2)
    for i in range(2):
        p = f"{est}.Upsampling_Blocks.{i}"
        dec[f"ResnetBlock1D_{res_i}"] = _resnet_params(sd, f"{p}.0")
        res_i += 1
        dec[f"BasicTransformerBlock_{trn_i}"] = _basic_transformer_params(sd, f"{p}.1.0")
        trn_i += 1
        if i == 0:
            dec["Upsample1D_0"] = {
                "ConvTranspose_0": {
                    "kernel": _t_convtranspose(sd[f"{p}.2.conv.weight"]),
                    "bias": sd[f"{p}.2.conv.bias"],
                },
            }
        else:
            dec["Conv_1"] = {"kernel": _t_conv(sd[f"{p}.2.weight"]),
                             "bias": sd[f"{p}.2.bias"]}

    dec["Conv_2"] = {"kernel": _t_conv(sd[f"{est}.final_conv.weight"]),
                     "bias": sd[f"{est}.final_conv.bias"]}
    dec["GroupNorm_0"] = {"scale": sd[f"{est}.final_norm.weight"],
                          "bias": sd[f"{est}.final_norm.bias"]}
    # final_proj is Conv1d k=1 -> flax Conv kernel (1, in, out)
    dec["Conv_3"] = {"kernel": _t_conv(sd[f"{est}.final_proj.weight"]),
                     "bias": sd[f"{est}.final_proj.bias"]}

    return {"encoder": enc, "decoder": dec}


def load_matcha_torch_checkpoint(path, params_like=None):
    """Load + convert a reference Lightning checkpoint; validates tree/shapes."""
    sd = _load_state_dict(path)
    params = convert_matcha_state_dict(sd)
    if params_like is not None:
        _validate_tree(params, params_like)
    return _to_jnp(params)


# --------------------------------------------------------------------- hifigan
def _fold_weight_norm(sd, prefix):
    """weight = g * v / ||v|| over (in, k) per output channel (torch weight_norm dim=0)."""
    g = np.asarray(sd[f"{prefix}.weight_g"])
    v = np.asarray(sd[f"{prefix}.weight_v"])
    norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / norm


def _maybe_weight(sd, prefix):
    if f"{prefix}.weight_g" in sd:
        return _fold_weight_norm(sd, prefix)
    return np.asarray(sd[f"{prefix}.weight"])


def convert_hifigan_state_dict(sd: Dict[str, np.ndarray], cfg=None) -> dict:
    """Released `generator_v1` state_dict (`state_dict['generator']`) -> flax params."""
    from matcha_tpu.models.hifigan import HiFiGANConfig

    cfg = cfg or HiFiGANConfig()
    params = {}
    params["conv_pre"] = {"kernel": _t_conv(_maybe_weight(sd, "conv_pre")),
                          "bias": sd["conv_pre.bias"]}
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        # torch ConvTranspose1d weight-normed: weight (in, out, k)
        w = _maybe_weight(sd, f"ups.{i}")
        params[f"up_{i}"] = {"kernel": _t_convtranspose(w), "bias": sd[f"ups.{i}.bias"]}
        for j in range(num_kernels):
            r = f"resblocks.{i * num_kernels + j}"
            block = {}
            n_dil = len(cfg.resblock_dilation_sizes[j])
            for m in range(n_dil):
                block[f"WNConv_{2 * m}"] = {"Conv_0": {
                    "kernel": _t_conv(_maybe_weight(sd, f"{r}.convs1.{m}")),
                    "bias": sd[f"{r}.convs1.{m}.bias"],
                }}
                block[f"WNConv_{2 * m + 1}"] = {"Conv_0": {
                    "kernel": _t_conv(_maybe_weight(sd, f"{r}.convs2.{m}")),
                    "bias": sd[f"{r}.convs2.{m}.bias"],
                }}
            params[f"res_{i}_{j}"] = block
    params["conv_post"] = {"kernel": _t_conv(_maybe_weight(sd, "conv_post")),
                           "bias": sd["conv_post.bias"]}
    return params


def load_hifigan_torch_checkpoint(path):
    """Load the released HiFi-GAN generator checkpoint (`generate_HifiGan.py:70-79`)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["generator"] if "generator" in ckpt else ckpt
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return _to_jnp(convert_hifigan_state_dict(sd))


# ----------------------------------------------------------------------- utils
def _to_jnp(tree):
    import jax.numpy as jnp

    return {
        k: _to_jnp(v) if isinstance(v, dict) else jnp.asarray(np.asarray(v, np.float32))
        for k, v in tree.items()
    }


def _validate_tree(converted, params_like, path=""):
    """Check the converted tree matches the model's expected structure and shapes."""
    like_keys = set(params_like.keys())
    got_keys = set(converted.keys())
    if like_keys != got_keys:
        missing = like_keys - got_keys
        extra = got_keys - like_keys
        raise ValueError(f"param tree mismatch at '{path}': missing={missing} extra={extra}")
    for k in like_keys:
        a, b = converted[k], params_like[k]
        if isinstance(b, dict):
            _validate_tree(a, b, f"{path}/{k}")
        else:
            if tuple(np.shape(a)) != tuple(np.shape(b)):
                raise ValueError(
                    f"shape mismatch at '{path}/{k}': got {np.shape(a)}, want {np.shape(b)}"
                )
