"""Neural modules (flax.linen): encoder, decoder U-Net, transformer blocks, RoPE."""

from matcha_tpu.nn.decoder import Decoder, DecoderConfig
from matcha_tpu.nn.encoder import EncoderConfig, TextEncoder
from matcha_tpu.nn.transformer import BasicTransformerBlock, FeedForward

__all__ = [
    "Decoder",
    "DecoderConfig",
    "EncoderConfig",
    "TextEncoder",
    "BasicTransformerBlock",
    "FeedForward",
]
