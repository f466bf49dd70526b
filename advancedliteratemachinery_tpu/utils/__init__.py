from advancedliteratemachinery_tpu.utils.profiling import StepTimer, trace

__all__ = ["StepTimer", "trace"]
