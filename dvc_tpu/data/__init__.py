from .dataset import (DenseCaptionDataset, BatchLoader, collate,
                      resize_feature, read_feature_file, FEATURE_SPECS)
from .vocabulary import Translator, build_vocab
from .fusion_dataset import FusionDataset, FusionBatchLoader, fusion_collate
from .prefetch import PrefetchLoader
from . import native_io
from . import video_clips

__all__ = ["DenseCaptionDataset", "BatchLoader", "collate", "resize_feature",
           "read_feature_file", "FEATURE_SPECS", "Translator", "build_vocab",
           "FusionDataset", "FusionBatchLoader", "fusion_collate",
           "PrefetchLoader", "native_io", "video_clips"]
