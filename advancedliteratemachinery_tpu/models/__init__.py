from advancedliteratemachinery_tpu.models import layers  # noqa: F401

# importing a model module registers it in core.registry.MODELS
from advancedliteratemachinery_tpu.models.abinet import ABINetVision  # noqa: F401
from advancedliteratemachinery_tpu.models.bros import BrosTextEncoder  # noqa: F401
from advancedliteratemachinery_tpu.models.convnext import ConvNeXt  # noqa: F401
from advancedliteratemachinery_tpu.models.db import DBDetector  # noqa: F401
from advancedliteratemachinery_tpu.models.dla import DLASeg  # noqa: F401
from advancedliteratemachinery_tpu.models.docxlayout import DocXLayout  # noqa: F401
from advancedliteratemachinery_tpu.models.focalnet import FocalNet  # noqa: F401
from advancedliteratemachinery_tpu.models.geolayoutlm import GeoLayoutLM  # noqa: F401
from advancedliteratemachinery_tpu.models.levocr import LevOCR  # noqa: F401
from advancedliteratemachinery_tpu.models.lister import LISTER  # noqa: F401
from advancedliteratemachinery_tpu.models.lister_baselines import (  # noqa: F401
    CTCDecoder,
    ParallelAttention,
    RNNAttention,
)
from advancedliteratemachinery_tpu.models.lore import LORE  # noqa: F401
from advancedliteratemachinery_tpu.models.mgp_str import MGPSTR, MGPSTRConfig  # noqa: F401
from advancedliteratemachinery_tpu.models.omniparser import OmniParser  # noqa: F401
from advancedliteratemachinery_tpu.models.rcnn import (  # noqa: F401
    CascadeRCNN,
    VGTCascadeDetector,
)
from advancedliteratemachinery_tpu.models.trcg import TRCG, trcg_generate  # noqa: F401
from advancedliteratemachinery_tpu.models.swin import SwinTransformer  # noqa: F401
from advancedliteratemachinery_tpu.models.vgt import VGTBackbone  # noqa: F401
from advancedliteratemachinery_tpu.models.vit import VisionTransformer, ViTConfig  # noqa: F401
from advancedliteratemachinery_tpu.models.vlpt import VLPT  # noqa: F401
from advancedliteratemachinery_tpu.models.webrpg import WebRPGModel  # noqa: F401
