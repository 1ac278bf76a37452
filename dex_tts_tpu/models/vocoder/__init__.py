from dex_tts_tpu.models.vocoder.bigvgan import BigVGANConfig, BigVGANGenerator
from dex_tts_tpu.models.vocoder.hifigan import HiFiGANConfig, HiFiGANGenerator

__all__ = [
    "BigVGANConfig",
    "BigVGANGenerator",
    "HiFiGANGenerator",
    "HiFiGANConfig",
]
