"""matcha_tpu: a TPU-native (JAX/XLA/Pallas) Matcha-TTS framework.

A from-scratch reimplementation of the capabilities of the reference PyTorch project
`Raph1821/Matcha-TTS-etu-UPMC-ENSAM`, designed TPU-first: static-shape mask-first models,
Pallas monotonic-alignment kernel, `lax.scan` ODE solvers, pjit/mesh data- and
tensor-parallel training.
"""

__version__ = "0.1.0"
