"""Tensor-parallel partition rules for model parameters.

Maps parameter-tree paths to PartitionSpecs over the ('data', 'model') mesh. Data
parallel is the primary strategy (params replicated); flipping `model > 1` shards the
megatron-style pairs — attention q/k/v output features + attention output input
features, and FFN hidden features — so the per-layer collective is a single all-reduce
inserted by the XLA SPMD partitioner. Everything else stays replicated.

Design note: the model is ~18M params, so TP is a scaling config flip (SURVEY.md §2.2),
not a necessity; rules are written so enabling it is zero-rewrite.
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matcha_tpu.parallel.mesh import MODEL_AXIS

# (path-substring, param-name, spec) rules; first match wins.
# Kernel layouts: Dense (in, out); Conv (k, in, out).
_RULES = [
    # encoder RoPE attention: shard heads over the output features of q/k/v,
    # gather via the out projection's input features.
    ("RoPEMultiHeadAttention", "query.kernel", P(None, MODEL_AXIS)),
    ("RoPEMultiHeadAttention", "query.bias", P(MODEL_AXIS)),
    ("RoPEMultiHeadAttention", "key.kernel", P(None, MODEL_AXIS)),
    ("RoPEMultiHeadAttention", "key.bias", P(MODEL_AXIS)),
    ("RoPEMultiHeadAttention", "value.kernel", P(None, MODEL_AXIS)),
    ("RoPEMultiHeadAttention", "value.bias", P(MODEL_AXIS)),
    ("RoPEMultiHeadAttention", "out.kernel", P(MODEL_AXIS, None)),
    # encoder conv-FFN: shard the filter dimension.
    ("ConvFFN", "Conv_0.kernel", P(None, None, MODEL_AXIS)),
    ("ConvFFN", "Conv_0.bias", P(MODEL_AXIS)),
    ("ConvFFN", "Conv_1.kernel", P(None, MODEL_AXIS, None)),
    # decoder transformer attention
    ("DiffusersAttention", "to_q.kernel", P(None, MODEL_AXIS)),
    ("DiffusersAttention", "to_k.kernel", P(None, MODEL_AXIS)),
    ("DiffusersAttention", "to_v.kernel", P(None, MODEL_AXIS)),
    ("DiffusersAttention", "to_out.kernel", P(MODEL_AXIS, None)),
    # decoder transformer FFN (Dense_0: dim->4*dim, Dense_1: 4*dim->dim)
    ("FeedForward", "Dense_0.kernel", P(None, MODEL_AXIS)),
    ("FeedForward", "Dense_0.bias", P(MODEL_AXIS)),
    ("FeedForward", "Dense_1.kernel", P(MODEL_AXIS, None)),
]


def _path_str(path) -> str:
    return ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def param_spec(path, param) -> P:
    """PartitionSpec for one parameter (path = jax.tree_util key path)."""
    p = _path_str(path)
    for scope, name, spec in _RULES:
        if scope in p and p.endswith(name):
            return spec
    return P()


def param_shardings(mesh: Mesh, params: Any):
    """Pytree of NamedShardings matching `params` (TP rules above, replicated default)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: NamedSharding(mesh, param_spec(path, p)), params
    )


def shard_params(mesh: Mesh, params: Any):
    """Place a parameter pytree onto the mesh per the rules."""
    return jax.device_put(params, param_shardings(mesh, params))
