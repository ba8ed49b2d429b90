"""Model families: MatchaTTS (text->mel) and HiFi-GAN (mel->waveform)."""

from matcha_tpu.models.matcha import MatchaConfig, MatchaTTS, create_model, init_params

__all__ = ["MatchaConfig", "MatchaTTS", "create_model", "init_params"]
