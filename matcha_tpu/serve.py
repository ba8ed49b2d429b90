"""Batched TTS serving engine with precompiled static-shape graphs.

The reference's inference surface is a one-sentence script that re-traces per call
(`/root/reference/generate.py`, `generate_HifiGan.py`). This engine is the
production-serving layer a deployment needs on TPU, built on the same two-stage
static-shape design as `cli/generate`:

  * every (text-bucket, mel-budget) pair is a FIXED-shape jitted graph — compiled
    once (persistent cache across processes), then every request is a pure device
    dispatch;
  * requests are batched: stage 1 (encoder + durations) picks the smallest mel
    budget that fits the longest utterance in the batch, stage 2 decodes the whole
    batch at that budget and crops per sample;
  * optional bf16 serving (params + activations; ~2.7x the fp32 throughput on v5e,
    see bench.py `bf16_x_realtime`) and either vocoder.

Usage:
    engine = TTSEngine(params, vocoder="hifigan", vocoder_params=gparams)
    wavs, info = engine.synthesise(["Hello there.", "Flow matching is fast."])
"""

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.audio.mel import MelConfig
from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS
from matcha_tpu.ops.masks import fix_len_compatibility
from matcha_tpu.text import simple_text_to_sequence


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@dataclass(frozen=True)
class ServeConfig:
    n_timesteps: int = 10
    temperature: float = 1.0
    length_scale: float = 1.0
    text_pad_multiple: int = 16
    max_text_len: int = 256
    # mel-frame budgets (each a fix_len_compatibility-valid static shape); a batch
    # decodes at the smallest budget >= its longest predicted utterance
    mel_budgets: Tuple[int, ...] = (128, 256, 512, 1024)
    max_batch: int = 16
    bf16: bool = False
    vocoder: str = "griffin_lim"  # or "hifigan"
    mel_cfg: MelConfig = field(default_factory=MelConfig)


class TTSEngine:
    """Precompiled batched text -> waveform synthesis."""

    def __init__(
        self,
        params,
        model_cfg: MatchaConfig = MatchaConfig(),
        cfg: ServeConfig = ServeConfig(),
        vocoder_params=None,
        hifigan_cfg=None,
        rng: Optional[jax.Array] = None,
    ):
        self.cfg = cfg
        self.model = MatchaTTS(model_cfg)
        if cfg.bf16:
            from matcha_tpu.models.precision import bf16_serving

            params = bf16_serving(params)
        self.params = params
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)

        if cfg.vocoder == "hifigan":
            if vocoder_params is None:
                raise ValueError("hifigan vocoder needs vocoder_params (folded, "
                                 "weight_norm=False layout — see "
                                 "train.vocoder.load_generator_for_inference)")
            from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

            self._gen = Generator(hifigan_cfg or HiFiGANConfig(), weight_norm=False)
            self._gen_params = vocoder_params
        else:
            self._gen = None

        # jitted stages (compiled per static shape, cached across calls)
        self._encode = jax.jit(self._encode_impl)
        self._decode = jax.jit(self._decode_impl, static_argnames=("budget",))
        self._vocode = jax.jit(self._vocode_impl)

    # ------------------------------------------------------------- jit bodies
    def _encode_impl(self, params, x, xl):
        return self.model.apply(
            {"params": params}, x, xl, self.cfg.length_scale,
            method=MatchaTTS.encode_durations,
        )

    def _decode_impl(self, params, mu_x, w_ceil, x_mask, y_lengths, key, *, budget):
        out = self.model.apply(
            {"params": params}, mu_x, w_ceil, x_mask, y_lengths, budget,
            self.cfg.n_timesteps, self.cfg.temperature,
            method=MatchaTTS.decode_fixed, rngs={"noise": key},
        )
        return out["mel"], out["mel_lengths"]

    def _vocode_impl(self, mel, key):
        if self._gen is not None:
            return jnp.clip(self._gen.apply({"params": self._gen_params}, mel), -1, 1)
        from matcha_tpu.audio.griffin_lim import mel_to_audio

        return mel_to_audio(self.cfg.mel_cfg, jnp.swapaxes(mel, -1, -2), rng=key)

    # ------------------------------------------------------------------- API
    def _tokenize(self, texts: Sequence[str]):
        cfg = self.cfg
        seqs = [simple_text_to_sequence(t)[: cfg.max_text_len] for t in texts]
        tx = min(_round_up(max(len(s) for s in seqs), cfg.text_pad_multiple),
                 cfg.max_text_len)
        x = np.zeros((len(seqs), tx), np.int32)
        xl = np.zeros((len(seqs),), np.int32)
        for i, s in enumerate(seqs):
            x[i, : len(s)] = s
            xl[i] = len(s)
        return jnp.asarray(x), jnp.asarray(xl)

    def _pick_budget(self, max_frames: int) -> int:
        for b in sorted(self.cfg.mel_budgets):
            if b >= max_frames:
                return b
        return max(self.cfg.mel_budgets)

    def warmup(self, batch_sizes: Sequence[int] = (1,),
               text: str = "warm up the compiler"):
        """Precompile the (batch, budget) graphs so serving never hits a compile.

        Text length maps to a padded text bucket (`text_pad_multiple`); warm with a
        representative `text` per bucket you expect to serve.
        """
        for bs in batch_sizes:
            x, xl = self._tokenize([text] * bs)
            mu_x, w_ceil, x_mask, y_lengths = self._encode(self.params, x, xl)
            for budget in self.cfg.mel_budgets:
                mel, _ = self._decode(self.params, mu_x, w_ceil, x_mask,
                                      jnp.minimum(y_lengths, budget), self._rng,
                                      budget=budget)
                jax.block_until_ready(self._vocode(mel, self._rng))

    def synthesise(self, texts: Sequence[str], seed: Optional[int] = None):
        """Batch of texts -> (list of float32 waveforms, info dict)."""
        import time

        cfg = self.cfg
        if len(texts) == 0:
            return [], {"rtf": float("nan"), "budget": 0}
        if len(texts) > cfg.max_batch:
            raise ValueError(f"batch of {len(texts)} exceeds max_batch={cfg.max_batch}")
        key = jax.random.PRNGKey(seed) if seed is not None else self._next_key()

        t0 = time.perf_counter()
        x, xl = self._tokenize(texts)
        mu_x, w_ceil, x_mask, y_lengths = self._encode(self.params, x, xl)
        max_frames = int(np.asarray(y_lengths).max())
        budget = self._pick_budget(fix_len_compatibility(max_frames))
        mel, mel_lengths = self._decode(self.params, mu_x, w_ceil, x_mask,
                                        jnp.minimum(y_lengths, budget), key,
                                        budget=budget)
        wav = np.asarray(self._vocode(mel, key))
        wall = time.perf_counter() - t0

        hop, sr = self.cfg.mel_cfg.hop_size, self.cfg.mel_cfg.sample_rate
        lengths = np.asarray(mel_lengths)
        wavs = [wav[i, : min(int(lengths[i]) * hop, wav.shape[1])].astype(np.float32)
                for i in range(len(texts))]
        from matcha_tpu.utils.profiling import rtf

        info = {"rtf": rtf(wall, int(lengths.sum()), hop, sr), "budget": budget,
                "wall_s": wall, "mel_lengths": lengths.tolist()}
        return wavs, info

    def _next_key(self):
        self._rng, key = jax.random.split(self._rng)
        return key
