from advancedliteratemachinery_tpu.pipelines.modules import (
    LayoutAnalysis,
    TableStructureRecognition,
    TextDetection,
    TextRecognition,
    crop_image,
    order_point,
)
from advancedliteratemachinery_tpu.pipelines.document import (
    DocumentStructurization,
    GeneralTextReading,
    TableParsing,
)

__all__ = [
    "LayoutAnalysis", "TableStructureRecognition", "TextDetection",
    "TextRecognition", "crop_image", "order_point",
    "DocumentStructurization", "GeneralTextReading", "TableParsing",
]
