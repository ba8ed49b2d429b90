"""Batched TTS serving engine with precompiled static-shape graphs.

The reference's inference surface is a one-sentence script that re-traces per call
(`/root/reference/generate.py`, `generate_HifiGan.py`). This engine is the
production-serving layer a deployment needs on TPU, built on the same two-stage
static-shape design as `cli/generate`:

  * every (text-bucket, mel-budget) pair is a FIXED-shape jitted graph — compiled
    once (persistent cache across processes), then every request is a pure device
    dispatch;
  * requests are batched: stage 1 (encoder + durations) picks the smallest mel
    budget that fits the longest utterance in the batch; stage 2 is ONE fused
    graph — noise draw + alignment + ODE decode + vocoder — per budget, so a
    group pays exactly two dispatches (and `synthesise_lowlatency` collapses even
    the budget pick into a single fixed-budget dispatch for latency-critical
    single sentences);
  * optional bf16 serving (params + activations; ~2.7x the fp32 throughput on v5e,
    see bench.py `bf16_x_realtime`) and either vocoder.

Concurrency contract:
  * `synthesise` is THREAD-SAFE: an internal lock serializes the rng split and the
    whole dispatch sequence, so concurrent callers never interleave device calls
    and (with an explicit `seed`/`seeds`) get deterministic outputs;
  * `serve(text, seed)` is the high-throughput concurrent entry point: requests
    from many threads are queued and batched (up to `max_batch`, waiting at most
    `max_wait_ms` for co-arriving requests) by a background worker started with
    `start_batching()`. The worker is a TWO-STAGE PIPELINE: a dispatch stage
    (tokenize -> encode -> budget pick -> fused decode dispatch + async
    device->host copy) and a delivery stage (block on the transfer, slice,
    deliver) — group N+1's host work and encode overlap group N's decode
    compute and wire transfer. Each request's waveform is a function of (text, seed,
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
import warnings
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


def _np_prng_keys(seeds) -> np.ndarray:
    """(n, 2) uint32 threefry key batch == jnp.stack([PRNGKey(s) for s in seeds]),
    built in pure numpy. `jax.random.PRNGKey` is an eager device op; in the
    serving hot path every eager op is an extra executable launch through a
    ~25 ms-latency tunnel (and a one-off compile on first shape). A threefry
    key from a 32-bit seed is literally [0, seed] (test_serve pins equality)."""
    return np.stack([
        np.array([0, int(s) & 0xFFFFFFFF], np.uint32) for s in seeds
    ])


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
    # waveform wire format: "float32", or "int16" (device-side 16-bit PCM
    # quantization — identical to what a PCM16 wav file stores, and 4x less
    # device->host traffic; the production serving choice behind a bandwidth-
    # limited transport). int16 engines return np.int16 waveforms.
    output_dtype: str = "float32"
    # decoder attention implementation per mel budget: "auto" selects the fused
    # VMEM Pallas kernel (ops/attention_pallas.py) for budgets >= 1024 frames —
    # the measured crossover where the (T, T) score tensor outgrows XLA's
    # on-chip fusion (~6% serving win, docs/DESIGN.md) — and XLA below it;
    # "xla"/"pallas" force one implementation for every budget.
    attn_impl: str = "auto"
    attn_pallas_min_budget: int = 1024
    # HiFi-GAN MRF lowering: "auto" selects the fused VMEM dilation-step kernel
    # (ops/mrf_pallas.py, im2col tap packing) at BATCH 1 where it measures ~13%
    # faster, and XLA above (the kernel loses at batch >= 8 — measured, see
    # docs/DESIGN.md "Vocoder-graph op breakdown"); "xla"/"pallas" force one
    # lowering for every batch. Batch is static per compiled graph, so the
    # selection costs nothing at dispatch time.
    vocoder_resblock_impl: str = "auto"
    mel_cfg: MelConfig = field(default_factory=MelConfig)
    # batching front-end: how long the worker waits for co-arriving requests
    # before dispatching a partial batch
    max_wait_ms: float = 5.0


class _Request:
    """One queued `serve()` call: text + seed in, waveform (or error) out."""

    __slots__ = ("text", "seed", "event", "wav", "info", "error", "t_enqueue",
                 "_dispatched")

    def __init__(self, text: str, seed: int):
        self.text = text
        self.seed = seed
        self.event = threading.Event()
        self.wav = None
        self.info = None
        self.error = None
        self.t_enqueue = time.perf_counter()
        self._dispatched = False  # True once its sub-group's decode is in flight


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
        mesh=None,
    ):
        """`mesh`: optional jax.sharding.Mesh — batched inference shards over the
        mesh's 'data' axis exactly like training does (SURVEY.md §2.2 DP row):
        params are replicated, every batch-dim input is sharded over 'data', and
        XLA partitions the whole fused graph batch-wise (no collectives needed —
        per-utterance synthesis is embarrassingly parallel, so scaling is linear
        over ICI). Requests are padded to a multiple of the data-axis size."""
        self.cfg = cfg
        self.model = MatchaTTS(model_cfg)
        self._model_pallas = None
        if cfg.attn_impl in ("auto", "pallas"):
            import dataclasses

            self._model_pallas = MatchaTTS(dataclasses.replace(
                model_cfg,
                decoder=dataclasses.replace(model_cfg.decoder, attn_impl="pallas"),
            ))
        if cfg.bf16:
            from matcha_tpu.models.precision import bf16_serving

            params = bf16_serving(params)
            if vocoder_params is not None:
                # the generator is part of the same fused decode graph — bf16
                # params keep its convs on the MXU's native dtype (the f32
                # generator was measured ~2.7x slower at batch 1)
                vocoder_params = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, vocoder_params)
        self.mesh = mesh
        self._n_data = 1
        if mesh is not None:
            from matcha_tpu.parallel.mesh import DATA_AXIS, replicated

            self._n_data = mesh.shape[DATA_AXIS]
            self._batch_sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(DATA_AXIS))
            params = jax.device_put(params, replicated(mesh))
            if vocoder_params is not None:
                vocoder_params = jax.device_put(vocoder_params, replicated(mesh))
        self.params = params
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)

        if cfg.vocoder == "hifigan":
            if vocoder_params is None:
                raise ValueError("hifigan vocoder needs vocoder_params (folded, "
                                 "weight_norm=False layout — see "
                                 "train.vocoder.load_generator_for_inference)")
            from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

            impl = cfg.vocoder_resblock_impl
            self._gen = Generator(hifigan_cfg or HiFiGANConfig(), weight_norm=False,
                                  resblock_impl="xla" if impl == "auto" else impl)
            # "auto": a second Generator (same parameter tree) with the fused
            # Pallas MRF blocks, selected per graph at batch 1 (see ServeConfig)
            self._gen_pallas = (Generator(hifigan_cfg or HiFiGANConfig(),
                                          weight_norm=False, resblock_impl="pallas")
                                if impl == "auto" else None)
            self._gen_params = vocoder_params
        else:
            self._gen = None
            self._gen_pallas = None

        # serializes rng state mutation and device dispatch sequences: concurrent
        # synthesise() callers never interleave their encode/decode/vocode calls
        self._lock = threading.Lock()
        # batching front-end state (started on demand via start_batching)
        self._pending: list = []
        self._pending_cv = threading.Condition()
        self._worker: Optional[threading.Thread] = None
        self._stop_worker = False

        # jitted stages (compiled per static shape, cached across calls).
        # The decode side is ONE fused graph — noise draw + path build + ODE
        # decode + vocoder — so a request group pays exactly two dispatches:
        # encode (host reads predicted lengths to pick the static budget), then
        # the fused decode_vocode of its budget sub-group.
        self._encode = jax.jit(self._encode_impl)
        self._decode_vocode = jax.jit(self._decode_vocode_impl,
                                      static_argnames=("budget",))
        self._decode_vocode_batch = jax.jit(self._decode_vocode_batch_impl,
                                            static_argnames=("budget",))
        self._synth_fused = jax.jit(self._synth_fused_impl,
                                    static_argnames=("budget",))

    # ------------------------------------------------------------- jit bodies
    def _encode_impl(self, params, x, xl):
        return self.model.apply(
            {"params": params}, x, xl, self.cfg.length_scale,
            method=MatchaTTS.encode_durations,
        )

    def _model_for(self, budget: int):
        """Decoder variant for a mel budget: the fused VMEM attention kernel
        where it measured a win (>= attn_pallas_min_budget frames, "auto"), XLA
        below. Both variants share one parameter tree; `budget` is static under
        jit, so the selection costs nothing at dispatch time."""
        if self._model_pallas is None or self.cfg.attn_impl == "xla":
            return self.model
        if (self.cfg.attn_impl == "pallas"
                or budget >= self.cfg.attn_pallas_min_budget):
            return self._model_pallas
        return self.model

    def _decode_impl(self, params, mu_x, w_ceil, x_mask, y_lengths, key, *,
                     budget, z=None):
        out = self._model_for(budget).apply(
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

    def _pack_wav(self, wav, mel_lengths):
        """Waveforms + per-sample mel lengths as ONE array, in the configured
        wire dtype. A device->host sync through the axon tunnel costs ~25 ms of
        RPC latency regardless of size, so the decode graphs return a single
        (B, T*hop + 1) array — sample i's length rides as the trailing element —
        instead of two arrays fetched by two sequential RPCs. int16 mode also
        quantizes to 16-bit PCM on device (4x less wire traffic, bit-identical
        to the PCM16 wav file the waveform ends up in). Lengths are exact in
        both dtypes (<= 2^24 in f32, <= 32767 in int16)."""
        if self.cfg.output_dtype == "int16":
            wav = jnp.round(jnp.clip(wav, -1, 1) * 32767.0).astype(jnp.int16)
            tail = mel_lengths.astype(jnp.int16)
        else:
            wav = wav.astype(jnp.float32)
            tail = mel_lengths.astype(jnp.float32)
        return jnp.concatenate([wav, tail[:, None]], axis=1)

    @staticmethod
    def _unpack_wav(packed):
        arr = np.asarray(packed)  # the single device->host sync
        return arr[:, :-1], arr[:, -1].astype(np.int32)

    @staticmethod
    def _unpack_wav2(packed):
        """2-tail layout of the seeded decode graphs: (wav, clamped mel
        lengths, unclamped predicted lengths)."""
        arr = np.asarray(packed)  # the single device->host sync
        return (arr[:, :-2], arr[:, -2].astype(np.int32),
                arr[:, -1].astype(np.int32))

    def _decode_vocode_impl(self, params, mu_x, w_ceil, x_mask, y_lengths, z_keys,
                            *, budget):
        """Per-request-seeded decode side in ONE dispatch: noise draw (vmap over
        request keys) + alignment + ODE decode + vocoder. Fusing these (vs the
        round-3 4-stage sequence) removes two ~28 ms host->device round trips per
        sub-group through a remote-device tunnel. Returns a packed array with TWO
        tail elements per row — [wav..., clamped mel length, UNCLAMPED predicted
        length] — so single-budget engines can flag truncation without any
        stage-A host sync (see _dispatch_group)."""
        z = self._draw_z_impl(z_keys, budget=budget)
        gl_keys = jax.vmap(jax.random.fold_in)(
            z_keys, jnp.ones(z_keys.shape[0], jnp.uint32))
        mel, mel_lengths = self._decode_impl(
            params, mu_x, w_ceil, x_mask, y_lengths, jax.random.PRNGKey(0),
            budget=budget, z=z,
        )
        packed = self._pack_wav(self._vocode_seeded_impl(mel, gl_keys), mel_lengths)
        tail_dtype = jnp.int16 if self.cfg.output_dtype == "int16" else jnp.float32
        return jnp.concatenate(
            [packed, jnp.minimum(y_lengths, 32767).astype(tail_dtype)[:, None]],
            axis=1)

    def _decode_vocode_batch_impl(self, params, mu_x, w_ceil, x_mask, y_lengths,
                                  key, *, budget):
        """Batch-seed decode side in one dispatch: one noise draw shaped over the
        batch (reference-synthesise semantics) + vocoder, same key for both —
        matching the round-3 separate-stage behavior exactly. Packed return."""
        mel, mel_lengths = self._decode_impl(
            params, mu_x, w_ceil, x_mask, y_lengths, key, budget=budget)
        return self._pack_wav(self._vocode_impl(mel, key), mel_lengths)

    def _synth_fused_impl(self, params, x, xl, key, *, budget):
        """Whole pipeline — encode + decode + vocode — as ONE graph at a static
        budget: the low-latency path (synthesise_lowlatency). No host read of the
        predicted lengths, so a single dispatch + a single device->host sync.
        The UNCLAMPED predicted frame count rides as one more tail element so the
        host can flag truncation without a second sync."""
        mu_x, w_ceil, x_mask, y_lengths = self._encode_impl(params, x, xl)
        packed = self._decode_vocode_batch_impl(
            params, mu_x, w_ceil, x_mask, jnp.minimum(y_lengths, budget), key,
            budget=budget)
        tail_dtype = jnp.int16 if self.cfg.output_dtype == "int16" else jnp.float32
        return jnp.concatenate(
            [packed, jnp.minimum(y_lengths, 32767).astype(tail_dtype)[:, None]],
            axis=1)

    def _gen_for(self, batch: int):
        """Generator variant by (static, trace-time) batch size: the fused MRF
        Pallas kernel wins ~13% at batch 1 and loses at batch >= 8 (measured,
        DESIGN.md); both variants share one parameter tree."""
        if self._gen_pallas is not None and batch == 1:
            return self._gen_pallas
        return self._gen

    def _vocode_impl(self, mel, key):
        if self._gen is not None:
            gen = self._gen_for(mel.shape[0])
            return jnp.clip(gen.apply({"params": self._gen_params}, mel), -1, 1)
        from matcha_tpu.audio.griffin_lim import mel_to_audio

        return mel_to_audio(self.cfg.mel_cfg, jnp.swapaxes(mel, -1, -2), rng=key)

    def _vocode_seeded_impl(self, mel, keys):
        """Per-sample-deterministic vocode: HiFi-GAN has no rng; Griffin-Lim draws
        its phase init per sample from that sample's key (vmap) instead of one
        batch-shaped draw, so sample i's waveform is batch-composition-independent."""
        if self._gen is not None:
            gen = self._gen_for(mel.shape[0])
            return jnp.clip(gen.apply({"params": self._gen_params}, mel), -1, 1)
        from matcha_tpu.audio.griffin_lim import mel_to_audio

        return jax.vmap(
            lambda m, k: mel_to_audio(self.cfg.mel_cfg, jnp.swapaxes(m, -1, -2)[None],
                                      rng=k)[0]
        )(mel, keys)

    # ------------------------------------------------------------------- API
    def _tokenize(self, texts: Sequence[str], pad_pow2: bool = False):
        """Token batch, padded so the batch dim splits evenly over a mesh's
        'data' axis (extra rows repeat row 0 and are simply never read back);
        mesh-sharded placement when serving over a mesh. `pad_pow2` additionally
        rounds the batch up to a power of two — the batching front-end uses it
        so every compiled graph family is covered by a pow2 warmup."""
        cfg = self.cfg
        seqs = [simple_text_to_sequence(t)[: cfg.max_text_len] for t in texts]
        tx = min(_round_up(max(len(s) for s in seqs), cfg.text_pad_multiple),
                 cfg.max_text_len)
        n = len(seqs)
        if pad_pow2:
            n = 1 << (n - 1).bit_length()
        n += -n % self._n_data
        x = np.zeros((n, tx), np.int32)
        xl = np.zeros((n,), np.int32)
        for i in range(n):
            s = seqs[i] if i < len(seqs) else seqs[0]
            x[i, : len(s)] = s
            xl[i] = len(s)
        return self._put(jnp.asarray(x)), self._put(jnp.asarray(xl))

    def _put(self, arr):
        """Shard a batch-leading-dim array over the mesh 'data' axis (no-op
        without a mesh)."""
        if self.mesh is None:
            return arr
        return jax.device_put(arr, self._batch_sharding)

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
            z_keys = self._put(jnp.asarray(_np_prng_keys(range(int(x.shape[0])))))
            for budget in self.cfg.mel_budgets:
                w1 = self._decode_vocode(self.params, mu_x, w_ceil, x_mask,
                                         y_lengths, z_keys, budget=budget)
                w2 = self._decode_vocode_batch(self.params, mu_x, w_ceil, x_mask,
                                               y_lengths, self._rng, budget=budget)
                jax.block_until_ready((w1, w2))

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
            y_np = np.asarray(y_lengths)
            max_frames = int(y_np.max())
            budget = self._pick_budget(fix_len_compatibility(max_frames))
            # No silent truncation (deviation from the reference, whose y_lengths
            # is unbounded — `matcha_tts.py:220-222`): decode_fixed clamps each
            # sample to the budget in-graph; any sample whose PREDICTED length
            # exceeds the largest configured budget is flagged per-text.
            truncated = [int(f) > budget for f in y_np[: len(texts)]]
            if any(truncated):
                warnings.warn(
                    f"{sum(truncated)}/{len(texts)} utterance(s) exceed the largest "
                    f"mel budget ({budget} frames) and will be truncated; raise "
                    "ServeConfig.mel_budgets for longer audio", stacklevel=2)
            # NOTE: no host-side clamp/gather ops here — decode_fixed clamps
            # y_lengths to the budget in-graph, and every eager op would be an
            # extra executable launch through the device tunnel.
            if seeds is not None:
                pad = [int(seeds[0])] * (int(x.shape[0]) - len(seeds))
                z_keys = self._put(jnp.asarray(_np_prng_keys(list(seeds) + pad)))
                packed = self._decode_vocode(
                    self.params, mu_x, w_ceil, x_mask, y_lengths, z_keys,
                    budget=budget)
                wav, lengths, _ = self._unpack_wav2(packed)
            else:
                packed = self._decode_vocode_batch(
                    self.params, mu_x, w_ceil, x_mask, y_lengths, key,
                    budget=budget)
                wav, lengths = self._unpack_wav(packed)
            wall = time.perf_counter() - t0

        hop, sr = self.cfg.mel_cfg.hop_size, self.cfg.mel_cfg.sample_rate
        lengths = lengths[: len(texts)]
        wavs = [wav[i, : min(int(lengths[i]) * hop, wav.shape[1])]
                for i in range(len(texts))]
        from matcha_tpu.utils.profiling import rtf

        info = {"rtf": rtf(wall, int(lengths.sum()), hop, sr), "budget": budget,
                "wall_s": wall, "mel_lengths": lengths.tolist(),
                "truncated": truncated}
        return wavs, info

    def synthesise_lowlatency(self, text: str, seed: Optional[int] = None,
                              budget: Optional[int] = None):
        """Single-utterance minimum-latency path: text -> waveform in ONE device
        dispatch + one device->host sync.

        The two-stage path reads predicted lengths back to the host to pick the
        smallest viable mel budget — through a high-latency device tunnel that
        read costs a full round trip. Here the whole pipeline (encode + clamp +
        decode + vocode) runs as one fused graph at a STATIC `budget` (default:
        the largest configured budget, so any utterance fits); the extra decode
        FLOPs of the oversized budget are cheaper than a tunnel round trip for
        single sentences. Thread-safe. Returns (waveform, info).
        """
        budget = budget if budget is not None else max(self.cfg.mel_budgets)
        with self._lock:
            key = (jnp.asarray(_np_prng_keys([seed])[0]) if seed is not None
                   else self._next_key_locked())
            t0 = time.perf_counter()
            x, xl = self._tokenize([text])
            packed = self._synth_fused(self.params, x, xl, key, budget=budget)
            arr = np.asarray(packed)  # the single sync
            wall = time.perf_counter() - t0
        # tail layout: [..., clamped mel length, unclamped predicted length]
        wav, lengths = arr[:, :-2], arr[:, -2].astype(np.int32)
        predicted = int(arr[0, -1])
        hop, sr = self.cfg.mel_cfg.hop_size, self.cfg.mel_cfg.sample_rate
        ml = int(lengths[0])
        truncated = predicted > budget
        if truncated:
            warnings.warn(
                f"utterance predicts {predicted} mel frames, beyond the {budget}-"
                "frame budget — output truncated; pass a larger `budget`",
                stacklevel=2)
        from matcha_tpu.utils.profiling import rtf

        info = {"rtf": rtf(wall, ml, hop, sr), "budget": budget, "wall_s": wall,
                "mel_lengths": [ml], "truncated": truncated}
        return wav[0, : min(ml * hop, wav.shape[1])], info

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
            if self._worker.is_alive():
                # mid-dispatch worker outlived the join window: keep the reference
                # so start_batching() cannot spawn a second worker draining the
                # same pending list concurrently
                raise RuntimeError(
                    "batching worker still processing after 30 s join timeout; "
                    "not restartable until it drains"
                )
            self._worker = None

    def serve(self, text: str, seed: int):
        """Thread-safe single-utterance entry: enqueue, batch with concurrent
        requests, block until this request's waveform is ready.

        Returns (waveform, info). Deterministic: output depends only on
        (text, seed, mel budget) — see module docstring."""
        req = _Request(text, int(seed))
        with self._pending_cv:
            # liveness is checked INSIDE the condition lock: a concurrent
            # stop_batching() cannot slip between the check and the enqueue and
            # leave this request unprocessed forever
            if (self._worker is None or not self._worker.is_alive()
                    or self._stop_worker):
                raise RuntimeError(
                    "batching worker not running — call start_batching()")
            self._pending.append(req)
            self._pending_cv.notify_all()
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.wav, req.info

    def _batch_worker(self, wait_s: float):
        """Two-stage pipelined worker (r4 verdict item 2).

        Stage A (this thread): batch requests -> tokenize -> encode -> budget
        pick -> ONE fused decode dispatch per budget sub-group -> start the
        device->host copy ASYNCHRONOUSLY -> hand the in-flight result to stage B.
        Stage B (delivery thread): block on the transfer, slice, deliver.

        Dispatch is async and the transfer is started with copy_to_host_async,
        so group N+1's host work (tokenize, padding, python), its encode
        dispatch, and its ~25 ms tunnel RPCs all overlap group N's decode
        compute and wire transfer instead of serializing behind them — the old
        single-stage worker held everything back-to-back. The queue is bounded
        (2 groups in flight) for backpressure on device memory.
        """
        import queue

        deliveries: "queue.Queue" = queue.Queue(maxsize=2)
        deliverer = threading.Thread(
            target=self._delivery_worker, args=(deliveries,), daemon=True,
            name="tts-delivery-worker",
        )
        deliverer.start()
        try:
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
                    self._dispatch_group(reqs, deliveries)
                except Exception as e:  # keep the worker alive; fail only requests
                    for r in reqs:      # whose budget sub-group wasn't dispatched —
                        if not r.event.is_set() and not getattr(r, "_dispatched", False):
                            r.error = e
                            r.event.set()
        finally:
            deliveries.put(None)  # sentinel: drain then exit
            deliverer.join()

    def _dispatch_group(self, reqs, out_q):
        """Pipeline stage A: encode a group of requests together, then dispatch
        ONE fused graph (noise + decode + vocode) per mel-budget sub-group and
        hand the IN-FLIGHT device result to the delivery stage.

        Per-request determinism: each request's decode noise/GL phase comes from
        its own seed (`z_keys` mode of the fused graph) and its budget from its
        OWN predicted length — so joining a group changes neither. Sub-group
        batches are padded to the next power of two (by repeating row 0) to bound
        the set of compiled (batch, budget) decode graphs.

        The only host<->device sync here is the predicted-length read (needed to
        pick the static budget); the decode result is NOT waited on — its
        device->host copy is started asynchronously and stage B blocks on it,
        so the next group's work overlaps this group's decode + transfer.

        Hot-path discipline: zero eager device ops. Each sub-group re-runs the
        (cheap, <1%-of-graph) encoder at its own pow2-padded batch size instead
        of gathering rows out of the group encode — eager gathers would each be
        an executable launch through the ~25 ms-latency tunnel with a one-off
        compile per (group, sub-group) size pair; re-encoding keeps the path to
        exactly two pre-warmed jitted graph families.
        """
        t0 = time.perf_counter()
        with self._lock:
            x, xl = self._tokenize([r.text for r in reqs], pad_pow2=True)
            mu_x, w_ceil, x_mask, y_lengths = self._encode(self.params, x, xl)
            if len(self.cfg.mel_budgets) == 1:
                # ZERO-SYNC stage A: one configured budget means no host read
                # of the predicted lengths is needed to pick it — the dispatch
                # stage becomes fully asynchronous (the ~25 ms length-read RPC
                # disappears from the group's serial chain); truncation is
                # flagged in stage B from the packed predicted-length tail.
                y_np = None
                budget = next(iter(self.cfg.mel_budgets))
                by_budget = {budget: list(range(len(reqs)))}
            else:
                y_np = np.asarray(y_lengths)[: len(reqs)]  # the one stage-A sync
                budgets = [self._pick_budget(fix_len_compatibility(int(f)))
                           for f in y_np]
                by_budget = {}
                for i, b in enumerate(budgets):
                    by_budget.setdefault(b, []).append(i)
            wall_encode = time.perf_counter() - t0

            for budget, idx in sorted(by_budget.items()):
                t_sub = time.perf_counter()
                n = len(idx)
                # next pow2 bounds the set of compiled (batch, budget) graphs;
                # mesh rounding (if any) happens inside _tokenize
                padded_n = 1 << (n - 1).bit_length()
                sel = idx + [idx[0]] * (padded_n - n)
                if len(by_budget) == 1 and n == len(reqs) and int(x.shape[0]) == max(
                        padded_n, padded_n + (-padded_n % self._n_data)):
                    enc = (mu_x, w_ceil, x_mask, y_lengths)  # whole group, one
                    # budget: the group encode already has the right rows/shape
                else:
                    xs, xls = self._tokenize([reqs[i].text for i in sel],
                                             pad_pow2=True)
                    enc = self._encode(self.params, xs, xls)
                pad_n = int(enc[0].shape[0]) - padded_n  # mesh rounding pad rows
                z_keys = self._put(jnp.asarray(_np_prng_keys(
                    [reqs[i].seed for i in sel]
                    + [reqs[idx[0]].seed] * pad_n)))
                packed = self._decode_vocode(self.params, *enc, z_keys,
                                             budget=budget)
                try:  # start the device->host copy NOW; stage B just waits on it
                    packed.copy_to_host_async()
                except Exception:
                    pass  # sharded/older backends: stage B's np.asarray still works
                for i in idx:
                    reqs[i]._dispatched = True
                # blocks only when 2 groups are already in flight (backpressure)
                out_q.put((packed, reqs, idx, budget,
                           None if y_np is None else [int(f) for f in y_np],
                           wall_encode, t_sub))

    def _delivery_worker(self, out_q):
        """Pipeline stage B: block on each in-flight sub-group's transfer, slice
        per-request waveforms, deliver. Runs outside the engine lock — waiting on
        a device buffer is not a dispatch, so stage A keeps dispatching.

        Timing is per request: `wall_s` is the request's own compute path (shared
        encode + its sub-group's fused dispatch, including any pipeline wait —
        NOT other sub-groups processed before it), `latency_s` is enqueue ->
        delivery (what a caller actually waited, batching window and queueing
        included)."""
        from matcha_tpu.utils.profiling import rtf

        hop, sr = self.cfg.mel_cfg.hop_size, self.cfg.mel_cfg.sample_rate
        while True:
            item = out_q.get()
            if item is None:
                return
            packed, reqs, idx, budget, y_pred, wall_encode, t_sub = item
            try:
                wav, lengths, predicted = self._unpack_wav2(packed)
                now = time.perf_counter()
                wall = wall_encode + (now - t_sub)
                for j, i in enumerate(idx):
                    ml = int(lengths[j])
                    # predicted > its own budget; y_pred is None on the
                    # zero-sync single-budget path (read the packed tail)
                    pred_i = int(predicted[j]) if y_pred is None else y_pred[i]
                    trunc = pred_i > budget
                    if trunc:
                        warnings.warn(
                            f"request predicts {pred_i} mel frames, beyond "
                            f"the largest budget ({budget}) — output truncated",
                            stacklevel=2)
                    reqs[i].wav = wav[j, : min(ml * hop, wav.shape[1])]
                    reqs[i].info = {
                        "budget": budget, "mel_length": ml, "wall_s": wall,
                        "latency_s": now - reqs[i].t_enqueue,
                        "rtf": rtf(wall, ml, hop, sr), "group_size": len(reqs),
                        "truncated": trunc,
                    }
                    reqs[i].event.set()
            except Exception as e:  # fail only this sub-group's requests
                for i in idx:
                    if not reqs[i].event.is_set():
                        reqs[i].error = e
                        reqs[i].event.set()
