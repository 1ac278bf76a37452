from dex_tts_tpu.models.tts import DeXTTS, GeDEXTTS

__all__ = ["DeXTTS", "GeDEXTTS"]
