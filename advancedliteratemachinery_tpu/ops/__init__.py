from advancedliteratemachinery_tpu.ops.image import (
    crop_rects,
    normalize_crops,
    resize_word_crops,
    warp_quad_crops,
)
from advancedliteratemachinery_tpu.ops.attention import (
    attention,
    fused_qkv_attention,
    supports_fused_qkv,
)
from advancedliteratemachinery_tpu.ops.nms import box_iou_matrix, box_nms
from advancedliteratemachinery_tpu.ops.roi_align import roi_align
from advancedliteratemachinery_tpu.ops.vocab_decode import (
    matmul_greedy_decode,
    supports_fused_decode,
)

__all__ = [
    "attention", "box_iou_matrix", "box_nms", "crop_rects",
    "fused_qkv_attention", "matmul_greedy_decode", "normalize_crops",
    "resize_word_crops", "roi_align", "supports_fused_decode",
    "supports_fused_qkv", "warp_quad_crops",
]
