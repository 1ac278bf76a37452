from dex_tts_tpu.utils.config import Config, DotDict, load_config, set_experiment
from dex_tts_tpu.utils.misc import seed_init, intersperse, parse_filelist

__all__ = [
    "Config",
    "DotDict",
    "load_config",
    "set_experiment",
    "seed_init",
    "intersperse",
    "parse_filelist",
]
