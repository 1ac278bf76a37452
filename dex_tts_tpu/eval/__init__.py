from dex_tts_tpu.eval.metric import cer, mel_mae, wer

__all__ = ["mel_mae", "wer", "cer"]
