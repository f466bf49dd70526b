from advancedliteratemachinery_tpu.data.lmdb_reader import LmdbReader
from advancedliteratemachinery_tpu.data.str_dataset import (
    AlignCollate,
    BalancedMixer,
    LmdbStrDataset,
)

__all__ = ["LmdbReader", "AlignCollate", "BalancedMixer", "LmdbStrDataset"]
