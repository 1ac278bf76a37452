from dex_tts_tpu.models.vocoder.hifigan import HiFiGANConfig, HiFiGANGenerator

__all__ = ["HiFiGANGenerator", "HiFiGANConfig"]
