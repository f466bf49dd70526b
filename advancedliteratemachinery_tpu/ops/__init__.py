from advancedliteratemachinery_tpu.ops.image import (
    crop_rects,
    normalize_crops,
    resize_word_crops,
    warp_quad_crops,
)
# NOTE: do NOT re-export functions named like their submodule (`attention`,
# `roi_align`) — that rebinds the package attribute away from the module, so
# `import advancedliteratemachinery_tpu.ops.attention as A` would yield the
# function. Those are used via their submodules.
from advancedliteratemachinery_tpu.ops.attention import (
    fused_qkv_attention,
    supports_fused_qkv,
)
from advancedliteratemachinery_tpu.ops.nms import box_iou_matrix, box_nms
from advancedliteratemachinery_tpu.ops.vocab_decode import (
    matmul_greedy_decode,
    supports_fused_decode,
)

__all__ = [
    "box_iou_matrix", "box_nms", "crop_rects",
    "fused_qkv_attention", "matmul_greedy_decode", "normalize_crops",
    "resize_word_crops", "supports_fused_decode",
    "supports_fused_qkv", "warp_quad_crops",
]
