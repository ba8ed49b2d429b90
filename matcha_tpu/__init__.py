"""matcha_tpu: a TPU-native (JAX/XLA/Pallas) Matcha-TTS framework.

A from-scratch reimplementation of the capabilities of the reference PyTorch project
`Raph1821/Matcha-TTS-etu-UPMC-ENSAM`, designed TPU-first: static-shape mask-first models,
Pallas monotonic-alignment kernel, `lax.scan` ODE solvers, pjit/mesh data- and
tensor-parallel training.
"""

import os as _os

import jax as _jax

# The reference trains/infers in full fp32 ("32-true", train.py:87). JAX's DEFAULT
# matmul precision runs reduced-precision passes (bf16 on the MXU), which drifts
# ~1e-3 per transformer layer — so fp32 accumulation is the framework default.
# For speed-over-parity runs, set MATCHA_MATMUL_PRECISION=bfloat16 (or use bf16
# activations explicitly).
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("MATCHA_MATMUL_PRECISION", "float32"),
)

__version__ = "0.1.0"
