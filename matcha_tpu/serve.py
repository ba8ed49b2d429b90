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

Concurrency contract:
  * `synthesise` is THREAD-SAFE: an internal lock serializes the rng split and the
    whole dispatch sequence, so concurrent callers never interleave device calls
    and (with an explicit `seed`/`seeds`) get deterministic outputs;
  * `serve(text, seed)` is the high-throughput concurrent entry point: requests
    from many threads are queued and batched (up to `max_batch`, waiting at most
    `max_wait_ms` for co-arriving requests) by a background worker started with
    `start_batching()`. Each request's waveform is a function of (text, seed,
    its own mel budget) ONLY — per-sample noise is drawn from the request seed via
    the z-injection seam and decode groups are keyed by budget — so a request's
    output does not depend on what it was batched with, up to XLA batch-fusion
    ulps (batch-1 and batch-N graphs fuse differently; test_serve.py asserts
    threaded == solo at 1e-3 waveform tolerance, the ulp drift after Griffin-Lim's
    32 phase-recovery iterations).

Usage:
    engine = TTSEngine(params, vocoder="hifigan", vocoder_params=gparams)
    wavs, info = engine.synthesise(["Hello there.", "Flow matching is fast."])
    # or concurrent serving:
    engine.start_batching(max_wait_ms=5)
    wav, info = engine.serve("Hello there.", seed=123)   # from any thread
"""

import threading
import time
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
    # batching front-end: how long the worker waits for co-arriving requests
    # before dispatching a partial batch
    max_wait_ms: float = 5.0


class _Request:
    """One queued `serve()` call: text + seed in, waveform (or error) out."""

    __slots__ = ("text", "seed", "event", "wav", "info", "error")

    def __init__(self, text: str, seed: int):
        self.text = text
        self.seed = seed
        self.event = threading.Event()
        self.wav = None
        self.info = None
        self.error = None


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

        # serializes rng state mutation and device dispatch sequences: concurrent
        # synthesise() callers never interleave their encode/decode/vocode calls
        self._lock = threading.Lock()
        # batching front-end state (started on demand via start_batching)
        self._pending: list = []
        self._pending_cv = threading.Condition()
        self._worker: Optional[threading.Thread] = None
        self._stop_worker = False

        # jitted stages (compiled per static shape, cached across calls)
        self._encode = jax.jit(self._encode_impl)
        self._decode = jax.jit(self._decode_impl, static_argnames=("budget",))
        self._vocode = jax.jit(self._vocode_impl)
        self._draw_z = jax.jit(self._draw_z_impl, static_argnames=("budget",))
        self._vocode_seeded = jax.jit(self._vocode_seeded_impl)

    # ------------------------------------------------------------- jit bodies
    def _encode_impl(self, params, x, xl):
        return self.model.apply(
            {"params": params}, x, xl, self.cfg.length_scale,
            method=MatchaTTS.encode_durations,
        )

    def _decode_impl(self, params, mu_x, w_ceil, x_mask, y_lengths, key, *,
                     budget, z=None):
        out = self.model.apply(
            {"params": params}, mu_x, w_ceil, x_mask, y_lengths, budget,
            self.cfg.n_timesteps, self.cfg.temperature, z=z,
            method=MatchaTTS.decode_fixed, rngs={"noise": key},
        )
        return out["mel"], out["mel_lengths"]

    def _draw_z_impl(self, keys, *, budget):
        """Per-sample standard-normal decode noise from per-request PRNG keys.

        keys: (B,) stacked PRNGKeys -> (B, budget, n_feats). Row i depends only on
        keys[i] (vmap), so a request's noise is independent of its batch mates.
        """
        nf = self.model.cfg.n_feats
        return jax.vmap(lambda k: jax.random.normal(k, (budget, nf)))(keys)

    def _vocode_impl(self, mel, key):
        if self._gen is not None:
            return jnp.clip(self._gen.apply({"params": self._gen_params}, mel), -1, 1)
        from matcha_tpu.audio.griffin_lim import mel_to_audio

        return mel_to_audio(self.cfg.mel_cfg, jnp.swapaxes(mel, -1, -2), rng=key)

    def _vocode_seeded_impl(self, mel, keys):
        """Per-sample-deterministic vocode: HiFi-GAN has no rng; Griffin-Lim draws
        its phase init per sample from that sample's key (vmap) instead of one
        batch-shaped draw, so sample i's waveform is batch-composition-independent."""
        if self._gen is not None:
            return jnp.clip(self._gen.apply({"params": self._gen_params}, mel), -1, 1)
        from matcha_tpu.audio.griffin_lim import mel_to_audio

        return jax.vmap(
            lambda m, k: mel_to_audio(self.cfg.mel_cfg, jnp.swapaxes(m, -1, -2)[None],
                                      rng=k)[0]
        )(mel, keys)

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

    def synthesise(self, texts: Sequence[str], seed: Optional[int] = None,
                   seeds: Optional[Sequence[int]] = None):
        """Batch of texts -> (list of float32 waveforms, info dict). Thread-safe.

        `seed`: one seed for the whole batch (one noise draw shaped over the batch
        — output depends on batch composition, like the reference's synthesise).
        `seeds`: one seed PER text — decode noise and Griffin-Lim phase are drawn
        per sample from that sample's seed, so each waveform depends only on
        (text, seed, budget), not on batch mates. This is the batching front-end's
        determinism mode.
        """
        cfg = self.cfg
        if len(texts) == 0:
            return [], {"rtf": float("nan"), "budget": 0}
        if len(texts) > cfg.max_batch:
            raise ValueError(f"batch of {len(texts)} exceeds max_batch={cfg.max_batch}")
        if seeds is not None and len(seeds) != len(texts):
            raise ValueError("seeds must have one entry per text")

        with self._lock:
            if seeds is not None:
                key = None
            else:
                key = jax.random.PRNGKey(seed) if seed is not None else self._next_key_locked()

            t0 = time.perf_counter()
            x, xl = self._tokenize(texts)
            mu_x, w_ceil, x_mask, y_lengths = self._encode(self.params, x, xl)
            max_frames = int(np.asarray(y_lengths).max())
            budget = self._pick_budget(fix_len_compatibility(max_frames))
            if seeds is not None:
                z_keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
                gl_keys = jax.vmap(jax.random.fold_in)(
                    z_keys, jnp.ones(len(seeds), jnp.uint32))
                z = self._draw_z(z_keys, budget=budget)
                mel, mel_lengths = self._decode(self.params, mu_x, w_ceil, x_mask,
                                                jnp.minimum(y_lengths, budget),
                                                jax.random.PRNGKey(0), budget=budget,
                                                z=z)
                wav = np.asarray(self._vocode_seeded(mel, gl_keys))
            else:
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

    def _next_key_locked(self):
        """Split the engine rng; caller must hold self._lock."""
        self._rng, key = jax.random.split(self._rng)
        return key

    def _next_key(self):
        with self._lock:
            return self._next_key_locked()

    # --------------------------------------------------- batching front-end
    def start_batching(self, max_wait_ms: Optional[float] = None):
        """Start the background worker that batches concurrent `serve()` calls."""
        wait_s = (max_wait_ms if max_wait_ms is not None else self.cfg.max_wait_ms) / 1e3
        with self._pending_cv:
            if self._worker is not None and self._worker.is_alive():
                return
            self._stop_worker = False
            self._worker = threading.Thread(
                target=self._batch_worker, args=(wait_s,), daemon=True,
                name="tts-batch-worker",
            )
            self._worker.start()

    def stop_batching(self):
        with self._pending_cv:
            self._stop_worker = True
            self._pending_cv.notify_all()
        if self._worker is not None:
            self._worker.join(timeout=30)
            self._worker = None

    def serve(self, text: str, seed: int):
        """Thread-safe single-utterance entry: enqueue, batch with concurrent
        requests, block until this request's waveform is ready.

        Returns (waveform, info). Deterministic: output depends only on
        (text, seed, mel budget) — see module docstring."""
        if self._worker is None or not self._worker.is_alive():
            raise RuntimeError("batching worker not running — call start_batching()")
        req = _Request(text, int(seed))
        with self._pending_cv:
            self._pending.append(req)
            self._pending_cv.notify_all()
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.wav, req.info

    def _batch_worker(self, wait_s: float):
        while True:
            with self._pending_cv:
                while not self._pending and not self._stop_worker:
                    self._pending_cv.wait()
                if self._stop_worker and not self._pending:
                    return
                # max-wait batching: give co-arriving requests a window to join
                deadline = time.monotonic() + wait_s
                while len(self._pending) < self.cfg.max_batch and not self._stop_worker:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._pending_cv.wait(remaining)
                reqs = self._pending[: self.cfg.max_batch]
                del self._pending[: len(reqs)]
            try:
                self._process_group(reqs)
            except Exception as e:  # fail the whole group, keep the worker alive
                for r in reqs:
                    r.error = e
                    r.event.set()

    def _process_group(self, reqs):
        """Encode a group of requests together, decode per mel-budget sub-group.

        Per-request determinism: each request's decode noise/GL phase comes from
        its own seed (`seeds=` mode of the jit bodies) and its budget from its OWN
        predicted length — so joining a group changes neither. Sub-group batches
        are padded to the next power of two (by repeating row 0) to bound the set
        of compiled (batch, budget) decode graphs.
        """
        t0 = time.perf_counter()
        with self._lock:
            x, xl = self._tokenize([r.text for r in reqs])
            mu_x, w_ceil, x_mask, y_lengths = self._encode(self.params, x, xl)
            y_np = np.asarray(y_lengths)
            budgets = [self._pick_budget(fix_len_compatibility(int(f))) for f in y_np]
            by_budget: dict = {}
            for i, b in enumerate(budgets):
                by_budget.setdefault(b, []).append(i)

            hop, sr = self.cfg.mel_cfg.hop_size, self.cfg.mel_cfg.sample_rate
            for budget, idx in sorted(by_budget.items()):
                n = len(idx)
                padded_n = 1 << (n - 1).bit_length()  # next pow2, bounds compiles
                take = np.asarray(idx + [idx[0]] * (padded_n - n))
                z_keys = jnp.stack(
                    [jax.random.PRNGKey(reqs[i].seed) for i in idx]
                    + [jax.random.PRNGKey(reqs[idx[0]].seed)] * (padded_n - n)
                )
                gl_keys = jax.vmap(jax.random.fold_in)(
                    z_keys, jnp.ones(padded_n, jnp.uint32))
                z = self._draw_z(z_keys, budget=budget)
                mel, mel_lengths = self._decode(
                    self.params, jnp.take(mu_x, take, axis=0),
                    jnp.take(w_ceil, take, axis=0), jnp.take(x_mask, take, axis=0),
                    jnp.minimum(jnp.take(y_lengths, take), budget),
                    jax.random.PRNGKey(0), budget=budget, z=z,
                )
                wav = np.asarray(self._vocode_seeded(mel, gl_keys))
                lengths = np.asarray(mel_lengths)
                wall = time.perf_counter() - t0
                from matcha_tpu.utils.profiling import rtf

                for j, i in enumerate(idx):
                    ml = int(lengths[j])
                    reqs[i].wav = wav[j, : min(ml * hop, wav.shape[1])].astype(np.float32)
                    reqs[i].info = {
                        "budget": budget, "mel_length": ml, "wall_s": wall,
                        "rtf": rtf(wall, ml, hop, sr), "group_size": len(reqs),
                    }
                    reqs[i].event.set()
