"""Sequence-parallel tests: ring attention equivalence + seq-sharded decode.

Covers SURVEY.md §2.2's optional 'seq' axis: blockwise ring attention over mel-time
(explicit shard_map + ppermute) and whole-decoder sequence sharding via jit +
NamedSharding (XLA SPMD inserts the conv halo exchanges automatically).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matcha_tpu.parallel.ring_attention import (
    make_ring_self_attention,
    ring_attention_reference,
)


def _qkvb(b=2, h=4, t=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
               for _ in range(3))
    lengths = rng.integers(t // 2, t + 1, size=b)
    bias = jnp.asarray((np.arange(t)[None, :] < lengths[:, None]).astype(np.float32))
    return q, k, v, bias


def test_ring_attention_matches_dense():
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("seq",))
    q, k, v, bias = _qkvb()
    fn = make_ring_self_attention(mesh, "seq")
    out_ring = np.asarray(fn(q, k, v, bias))
    out_dense = np.asarray(ring_attention_reference(q, k, v, bias))
    np.testing.assert_allclose(out_ring, out_dense, atol=2e-5, rtol=1e-5)


def test_ring_attention_single_device_degenerate():
    mesh = Mesh(np.array(jax.devices()[:1]), ("seq",))
    q, k, v, bias = _qkvb(t=32, seed=1)
    out = np.asarray(make_ring_self_attention(mesh, "seq")(q, k, v, bias))
    ref = np.asarray(ring_attention_reference(q, k, v, bias))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_seq_sharded_decode_matches_unsharded():
    """decode_fixed with mel-time sharded over a 'seq' axis == single-device output.

    Uses jit + NamedSharding on the inputs; the SPMD partitioner parallelizes the
    U-Net convs (halo exchange) and attention over the sequence shards.
    """
    from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params
    from matcha_tpu.nn.decoder import DecoderConfig
    from matcha_tpu.nn.encoder import EncoderConfig

    cfg = MatchaConfig(
        n_feats=16,
        encoder=EncoderConfig(n_feats=16, n_channels=32, filter_channels=64,
                              n_layers=1, filter_channels_dp=32),
        decoder=DecoderConfig(in_channels=32, out_channels=16, channels=(32, 32),
                              attention_head_dim=16, num_heads=2, num_mid_blocks=1),
    )
    model = MatchaTTS(cfg)
    params = init_params(model, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    B, TX, TY = 2, 16, 64
    x = jnp.asarray(rng.integers(3, 140, size=(B, TX)), jnp.int32)
    xl = jnp.full((B,), TX, jnp.int32)

    def run(params, x, xl, key, seq_axis=None):
        out = model.apply({"params": params}, x, xl, TY, 2,
                          method=MatchaTTS.synthesise_fixed, rngs={"noise": key},
                          seq_axis=seq_axis)
        return out["mel"]

    key = jax.random.PRNGKey(7)
    base = np.asarray(jax.jit(run)(params, x, xl, key))

    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
    with mesh:
        sharded = jax.jit(lambda p, x, xl, k: run(p, x, xl, k, seq_axis="seq"))(
            jax.device_put(params, NamedSharding(mesh, P())),
            jax.device_put(x, NamedSharding(mesh, P())),
            jax.device_put(xl, NamedSharding(mesh, P())),
            key,
        )
    np.testing.assert_allclose(np.asarray(sharded), base, atol=1e-5, rtol=1e-5)


def test_integrated_attention_ring_matches_dense():
    """DiffusersAttention(seq_axis=...) under a seq mesh == its own dense path.

    Verifies the ring integration inside the decoder's attention module (not just
    the stand-alone kernel): same params, same inputs, mel-time sharded 4-way.
    """
    from matcha_tpu.nn.transformer import DiffusersAttention

    attn = DiffusersAttention(dim=32, heads=2, dim_head=16)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64, 32)).astype(np.float32))
    lengths = np.array([64, 40])
    bias = jnp.asarray((np.arange(64)[None, :] < lengths[:, None]).astype(np.float32))
    params = attn.init(jax.random.PRNGKey(0), x, bias, deterministic=True)["params"]

    dense = np.asarray(
        jax.jit(lambda p, x, b: attn.apply({"params": p}, x, b, deterministic=True))(
            params, x, bias
        )
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
    with mesh:
        ring = np.asarray(
            jax.jit(
                lambda p, x, b: attn.apply(
                    {"params": p}, x, b, deterministic=True, seq_axis="seq"
                )
            )(
                jax.device_put(params, NamedSharding(mesh, P())),
                jax.device_put(x, NamedSharding(mesh, P(None, "seq", None))),
                jax.device_put(bias, NamedSharding(mesh, P(None, "seq"))),
            )
        )
    np.testing.assert_allclose(ring, dense, atol=2e-5, rtol=1e-5)
