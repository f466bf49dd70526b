from advancedliteratemachinery_tpu.eval.str_metrics import (
    STRAccuracyCounter,
    benchmark_summary,
)
from advancedliteratemachinery_tpu.eval.tree_edit import tree_edit_distance, Node
from advancedliteratemachinery_tpu.eval.teds import TEDS
from advancedliteratemachinery_tpu.eval.kie_metrics import field_f1, ntED
from advancedliteratemachinery_tpu.eval.ocr_metrics import token_metrics
from advancedliteratemachinery_tpu.eval.lore_metrics import (
    bbox_prf,
    logical_accuracy,
)
from advancedliteratemachinery_tpu.eval.det_map import (
    cascade_to_coco,
    coco_map,
    spotting_json_to_coco,
)
from advancedliteratemachinery_tpu.eval.webrpg_metrics import (
    calculate_fid,
    elements_iou,
    style_consistency,
    webrpg_run_tests,
)

__all__ = [
    "STRAccuracyCounter", "benchmark_summary", "tree_edit_distance", "Node",
    "TEDS", "field_f1", "ntED", "token_metrics", "bbox_prf",
    "logical_accuracy", "cascade_to_coco", "coco_map",
    "spotting_json_to_coco", "calculate_fid", "elements_iou",
    "style_consistency", "webrpg_run_tests",
]
