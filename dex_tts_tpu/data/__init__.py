from dex_tts_tpu.data.dataset import TextMelDataset, BucketBatcher
from dex_tts_tpu.data.augmentation import augment_feature

__all__ = ["TextMelDataset", "BucketBatcher", "augment_feature"]
