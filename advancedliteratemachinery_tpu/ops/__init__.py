from advancedliteratemachinery_tpu.ops.image import normalize_crops, resize_word_crops

__all__ = ["normalize_crops", "resize_word_crops"]
