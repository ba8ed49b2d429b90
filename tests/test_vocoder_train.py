"""Vocoder GAN training tests: fused step correctness + trainer fit/resume smoke.

The reference ships HiFi-GAN discriminators and losses without a training loop
(`/root/reference/hifi_gan/models.py:128-283`); these tests cover the on-chip GAN step
(`matcha_tpu/train/vocoder.py`) at tiny model sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.audio.mel import MelConfig
from matcha_tpu.data.audio_dataset import AudioDataConfig, SyntheticWavDataset
from matcha_tpu.models.hifigan import Generator, HiFiGANConfig
from matcha_tpu.train.vocoder import (
    Discriminators,
    VocoderTrainConfig,
    VocoderTrainer,
    make_optimizers,
    make_vocoder_eval,
    make_vocoder_step,
)

SEG = 2048  # 8 mel frames at hop 256
TINY_GEN = HiFiGANConfig(upsample_initial_channel=16)
TINY_DISC = Discriminators(
    mpd_channels=(4, 8),
    msd_spec=((8, 15, 1, 1, 7), (8, 41, 4, 4, 20), (8, 5, 1, 1, 2)),
)
MEL = MelConfig()


def _init(gen, disc, cfg, steps_per_epoch=4):
    rng = jax.random.PRNGKey(0)
    gen_p = gen.init(rng, jnp.zeros((1, SEG // 256, 80)))["params"]
    disc_p = disc.init(rng, jnp.zeros((1, SEG)), jnp.zeros((1, SEG)))["params"]
    tx_g, tx_d = make_optimizers(cfg, steps_per_epoch)
    return gen_p, disc_p, tx_g.init(gen_p), tx_d.init(disc_p), tx_g, tx_d


def test_gan_step_updates_and_is_finite():
    cfg = VocoderTrainConfig()
    gen = Generator(TINY_GEN, weight_norm=True)
    gen_p, disc_p, g_opt, d_opt, tx_g, tx_d = _init(gen, TINY_DISC, cfg)
    step, scan_steps = make_vocoder_step(gen, TINY_DISC, tx_g, tx_d, cfg, MEL)

    ds = SyntheticWavDataset(n_items=4, segment_size=SEG)
    y = jnp.asarray(np.stack([ds.get_segment(i, np.random.default_rng(0)) for i in range(2)]))

    gen_p0 = jax.tree.map(lambda a: np.asarray(a).copy(), gen_p)
    metrics = None
    for _ in range(2):
        gen_p, disc_p, g_opt, d_opt, metrics = step(gen_p, disc_p, g_opt, d_opt, y)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # generator parameters actually moved
    moved = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()), gen_p, gen_p0)
    assert max(jax.tree.leaves(moved)) > 0

    # eval metric is a finite mel L1
    ev = make_vocoder_eval(gen, MEL)
    assert np.isfinite(float(ev(gen_p, y)))


def test_fold_weight_norm_matches_weight_normed_generator():
    """Folding parity of the reference's remove_weight_norm (`models.py:118-125`)."""
    from matcha_tpu.models.hifigan import fold_weight_norm

    gen_wn = Generator(TINY_GEN, weight_norm=True)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, SEG // 256, 80))
    params = gen_wn.init(jax.random.PRNGKey(0), mel)["params"]

    # perturb the scale params away from their scale_init=1 so the fold is non-trivial
    def perturb(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if name.endswith("scale"):
            k = jax.random.PRNGKey(abs(hash(name)) % (2**31))
            return leaf * jax.random.uniform(k, leaf.shape, minval=0.5, maxval=2.0)
        return leaf

    params = jax.tree_util.tree_map_with_path(perturb, params)

    y_wn = gen_wn.apply({"params": params}, mel)
    folded = fold_weight_norm(params)
    y_fold = Generator(TINY_GEN, weight_norm=False).apply({"params": folded}, mel)
    # folded tree must match the plain generator layout exactly
    plain = Generator(TINY_GEN, weight_norm=False).init(jax.random.PRNGKey(0), mel)["params"]
    assert jax.tree.structure(folded) == jax.tree.structure(plain)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_wn), atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_trained_vocoder_serving_loop(tmp_path):
    """train_vocoder checkpoint -> load_generator_for_inference -> waveform."""
    from matcha_tpu.train.vocoder import load_generator_for_inference

    cfg = VocoderTrainConfig(max_epochs=1, ckpt_dir=str(tmp_path / "vck"), log_every=1)
    data_cfg = AudioDataConfig(batch_size=2, segment_size=SEG)
    train_ds = SyntheticWavDataset(n_items=2, segment_size=SEG)
    from matcha_tpu.parallel import make_mesh

    mesh = make_mesh(devices=jax.devices()[:2])  # batch 2 shards over 2 devices
    trainer = VocoderTrainer(TINY_GEN, cfg, data_cfg, MEL, mesh=mesh, disc=TINY_DISC)
    gen_p, _, _ = trainer.fit(train_ds, None, max_epochs=1)

    folded = load_generator_for_inference(cfg.ckpt_dir)
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, SEG // 256, 80))
    y_serving = Generator(TINY_GEN, weight_norm=False).apply({"params": folded}, mel)
    y_train_form = Generator(TINY_GEN, weight_norm=True).apply({"params": gen_p}, mel)
    assert y_serving.shape == (1, SEG)
    np.testing.assert_allclose(
        np.asarray(y_serving), np.asarray(y_train_form), atol=1e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_vocoder_trainer_fit_and_resume(tmp_path):
    cfg = VocoderTrainConfig(max_epochs=1, ckpt_dir=str(tmp_path / "ck"), log_every=1)
    data_cfg = AudioDataConfig(batch_size=2, segment_size=SEG)
    train_ds = SyntheticWavDataset(n_items=4, segment_size=SEG)
    val_ds = SyntheticWavDataset(n_items=2, segment_size=SEG, seed=1)

    from matcha_tpu.parallel import make_mesh

    mesh = make_mesh(devices=jax.devices()[:2])  # batch 2 shards over 2 devices
    trainer = VocoderTrainer(TINY_GEN, cfg, data_cfg, MEL, mesh=mesh, disc=TINY_DISC)
    _, _, step = trainer.fit(train_ds, val_ds, max_epochs=1)
    assert step == 2  # 4 items / batch 2
    assert (tmp_path / "ck" / "logs" / "metrics.jsonl").exists()

    # auto-resume continues from the saved step
    trainer2 = VocoderTrainer(TINY_GEN, cfg, data_cfg, MEL, mesh=mesh, disc=TINY_DISC)
    _, _, step2 = trainer2.fit(train_ds, val_ds, max_epochs=2)
    assert step2 == 4


def test_vocoder_scan_dispatch_equals_sequential():
    """K GAN steps in one lax.scan dispatch == K single dispatches (the step is
    deterministic given the segments, so per-step metric equality across steps
    proves the state streams coincide)."""
    cfg = VocoderTrainConfig()
    gen = Generator(TINY_GEN, weight_norm=True)
    ds = SyntheticWavDataset(n_items=4, segment_size=SEG)
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(np.stack([ds.get_segment(i, rng) for i in range(2)]))
               for _ in range(2)]

    gen_p, disc_p, g_opt, d_opt, tx_g, tx_d = _init(gen, TINY_DISC, cfg)
    step, scan_steps = make_vocoder_step(gen, TINY_DISC, tx_g, tx_d, cfg, MEL)
    seq = []
    for y in batches:
        gen_p, disc_p, g_opt, d_opt, m = step(gen_p, disc_p, g_opt, d_opt, y)
        seq.append({k: float(v) for k, v in m.items()})

    gen_p2, disc_p2, g_opt2, d_opt2, *_ = _init(gen, TINY_DISC, cfg)
    gen_p2, disc_p2, g_opt2, d_opt2, mk = scan_steps(
        gen_p2, disc_p2, g_opt2, d_opt2, jnp.stack(batches)
    )
    for j in range(2):
        for k in seq[j]:
            np.testing.assert_allclose(float(mk[k][j]), seq[j][k], rtol=2e-5,
                                       atol=1e-6, err_msg=f"step {j} {k}")
