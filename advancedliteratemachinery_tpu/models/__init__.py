from advancedliteratemachinery_tpu.models import layers  # noqa: F401
from advancedliteratemachinery_tpu.models.mgp_str import MGPSTR, MGPSTRConfig  # noqa: F401
from advancedliteratemachinery_tpu.models.vit import VisionTransformer, ViTConfig  # noqa: F401
