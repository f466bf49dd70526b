from advancedliteratemachinery_tpu.pipelines.modules import (
    FormulaRecognition,
    LayoutAnalysis,
    TableStructureRecognition,
    TextDetection,
    TextRecognition,
    crop_image,
    order_point,
)
from advancedliteratemachinery_tpu.pipelines.file_loading import (
    load_document,
    load_image,
    load_pdf,
)
from advancedliteratemachinery_tpu.pipelines.document import (
    DocumentStructurization,
    convert_document,
    GeneralTextReading,
    TableParsing,
)
from advancedliteratemachinery_tpu.pipelines.scenevtg import (
    SceneVTGProposer,
    bezier_to_polygon,
)

__all__ = [
    "FormulaRecognition", "LayoutAnalysis", "TableStructureRecognition", "TextDetection",
    "TextRecognition", "crop_image", "order_point",
    "DocumentStructurization", "SceneVTGProposer", "bezier_to_polygon", "GeneralTextReading", "TableParsing",
    "convert_document", "load_document", "load_image", "load_pdf",
]
