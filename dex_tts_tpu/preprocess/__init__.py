from dex_tts_tpu.preprocess.preprocessor import Preprocessor, prepare_align
from dex_tts_tpu.preprocess.filelists import make_filelist

__all__ = ["Preprocessor", "prepare_align", "make_filelist"]
