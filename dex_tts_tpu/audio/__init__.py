from dex_tts_tpu.audio.mel import mel_filterbank
from dex_tts_tpu.audio.stft import (
    MelSpectrogram,
    griffin_lim,
    istft,
    stft_magnitude,
)

__all__ = [
    "mel_filterbank",
    "MelSpectrogram",
    "stft_magnitude",
    "istft",
    "griffin_lim",
]
