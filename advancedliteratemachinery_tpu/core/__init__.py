from advancedliteratemachinery_tpu.core.config import ConfigBase
from advancedliteratemachinery_tpu.core.precision import Policy, DEFAULT_POLICY

__all__ = ["ConfigBase", "Policy", "DEFAULT_POLICY"]
