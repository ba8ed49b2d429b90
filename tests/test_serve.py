"""Serving-engine tests: batched synthesis == direct model calls, budget bucketing,
per-sample cropping, warmup precompile."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, init_params
from matcha_tpu.nn.decoder import DecoderConfig
from matcha_tpu.nn.encoder import EncoderConfig
from matcha_tpu.serve import ServeConfig, TTSEngine

TINY = MatchaConfig(
    n_feats=8,
    encoder=EncoderConfig(n_feats=8, n_channels=16, filter_channels=32, n_heads=2,
                          n_layers=1, filter_channels_dp=16),
    decoder=DecoderConfig(in_channels=16, out_channels=8, channels=(16, 16),
                          attention_head_dim=8, num_heads=2, num_mid_blocks=1),
)
MEL8 = __import__("matcha_tpu.audio.mel", fromlist=["MelConfig"]).MelConfig(n_mels=8)


@pytest.fixture(scope="module")
def engine():
    model = MatchaTTS(TINY)
    params = init_params(model, jax.random.PRNGKey(0))
    cfg = ServeConfig(n_timesteps=2, mel_budgets=(32, 64, 128), max_batch=4,
                      vocoder="griffin_lim", mel_cfg=MEL8)
    return TTSEngine(params, model_cfg=TINY, cfg=cfg), params


def test_engine_matches_direct_model(engine):
    """Engine output mel lengths + budget picks must match direct model math."""
    eng, params = engine
    texts = ["hello world", "abc"]
    wavs, info = eng.synthesise(texts, seed=7)

    # direct two-stage call with identical inputs/noise
    x, xl = eng._tokenize(texts)
    model = eng.model
    mu_x, w_ceil, x_mask, y_lengths = model.apply(
        {"params": params}, x, xl, method=MatchaTTS.encode_durations)
    out = model.apply(
        {"params": params}, mu_x, w_ceil, x_mask,
        jnp.minimum(y_lengths, info["budget"]), info["budget"], 2,
        method=MatchaTTS.decode_fixed, rngs={"noise": jax.random.PRNGKey(7)},
    )
    assert info["mel_lengths"] == np.asarray(out["mel_lengths"]).tolist()
    assert len(wavs) == 2
    hop = MEL8.hop_size
    for wav, ml in zip(wavs, info["mel_lengths"]):
        assert wav.ndim == 1 and wav.dtype == np.float32
        assert abs(wav.shape[0] - ml * hop) <= hop  # per-sample crop
    assert info["budget"] in (32, 64, 128)
    assert np.isfinite(info["rtf"])


def test_engine_budget_bucketing(engine):
    eng, _ = engine
    assert eng._pick_budget(1) == 32
    assert eng._pick_budget(33) == 64
    assert eng._pick_budget(128) == 128
    assert eng._pick_budget(999) == 128  # clamps to the largest budget


def test_engine_batch_limit_and_empty(engine):
    eng, _ = engine
    wavs, info = eng.synthesise([])
    assert wavs == []
    with pytest.raises(ValueError, match="max_batch"):
        eng.synthesise(["x"] * 5)


def test_engine_warmup_then_serve_no_new_compile(engine):
    """After warmup, serving an identically-shaped request reuses compiled graphs."""
    eng, _ = engine
    eng.warmup(batch_sizes=(2,), text="hello world")
    n0 = eng._decode._cache_size()
    wavs, _ = eng.synthesise(["hello world", "hello there"], seed=1)
    assert len(wavs) == 2
    assert eng._decode._cache_size() == n0  # no new decode compile


def test_engine_hifigan_vocoder_path():
    """Engine with a (tiny) HiFi-GAN generator: waveform shape = frames * hop."""
    from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

    model = MatchaTTS(TINY)
    params = init_params(model, jax.random.PRNGKey(0))
    # 8-mel generator matching the tiny model's n_feats
    gcfg = HiFiGANConfig(upsample_initial_channel=16, num_mels=8)
    gen = Generator(gcfg, weight_norm=False)
    gparams = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 8)))["params"]

    cfg = ServeConfig(n_timesteps=2, mel_budgets=(32, 64), max_batch=2,
                      vocoder="hifigan", mel_cfg=MEL8)
    eng = TTSEngine(params, model_cfg=TINY, cfg=cfg, vocoder_params=gparams,
                    hifigan_cfg=gcfg)
    wavs, info = eng.synthesise(["hello", "hi"], seed=3)
    hop = MEL8.hop_size
    for wav, ml in zip(wavs, info["mel_lengths"]):
        assert wav.shape[0] == ml * hop
        assert np.abs(wav).max() <= 1.0


def test_engine_synthesise_thread_safe(engine):
    """Concurrent synthesise() callers: the internal lock serializes dispatches, so
    every threaded result is bit-equal to the same call made sequentially."""
    import threading

    eng, _ = engine
    calls = [(["hello world"], 11), (["abc", "de fg"], 22), (["thread safety"], 33)]
    expected = [eng.synthesise(texts, seed=s)[0] for texts, s in calls]

    results = [None] * len(calls)
    errors = []

    def run(i):
        try:
            for _ in range(3):  # repeat to increase interleaving pressure
                results[i] = eng.synthesise(calls[i][0], seed=calls[i][1])[0]
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(len(calls))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for got, want in zip(results, expected):
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)


def test_serve_batching_deterministic(engine):
    """Batched concurrent serve(): each request's waveform matches the same
    (text, seed) synthesised solo — per-request noise via the z seam and
    per-budget decode groups make outputs batch-composition-independent up to
    XLA batch-fusion ulps (batch-1 vs batch-N graphs fuse differently; the
    ~1e-7 mel drift is amplified through Griffin-Lim's 32 phase-projection
    iterations, hence the 1e-3 waveform tolerance)."""
    import threading

    eng, _ = engine
    reqs = [("hello world", 1), ("abc", 2), ("some longer sentence here", 3),
            ("hi", 4)]
    # solo references: seeds= mode, one request per batch
    expected = [eng.synthesise([t], seeds=[s])[0][0] for t, s in reqs]

    eng.start_batching(max_wait_ms=300)  # long window -> requests really group
    try:
        results = [None] * len(reqs)
        infos = [None] * len(reqs)
        barrier = threading.Barrier(len(reqs))

        def run(i):
            barrier.wait()
            results[i], infos[i] = eng.serve(reqs[i][0], seed=reqs[i][1])

        threads = [threading.Thread(target=run, args=(i,)) for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        eng.stop_batching()

    assert any(info["group_size"] > 1 for info in infos), "requests never batched"
    for (text, seed), got, want in zip(reqs, results, expected):
        assert got.shape == want.shape, (text, seed)
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4,
                                   err_msg=f"{text!r} seed={seed}")


def test_serve_requires_worker(engine):
    eng, _ = engine
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="start_batching"):
        eng.serve("hello", seed=0)
