from dex_tts_tpu.ops.masks import (
    duration_loss,
    fix_len_compatibility,
    generate_path,
    sequence_mask,
)
from dex_tts_tpu.ops.mas import maximum_path
from dex_tts_tpu.ops.segment import random_segment

__all__ = [
    "sequence_mask",
    "fix_len_compatibility",
    "generate_path",
    "duration_loss",
    "maximum_path",
    "random_segment",
]
