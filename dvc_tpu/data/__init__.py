from .dataset import (DenseCaptionDataset, BatchLoader, collate,
                      resize_feature, read_feature_file, FEATURE_SPECS)
from .vocabulary import Translator, build_vocab

__all__ = ["DenseCaptionDataset", "BatchLoader", "collate", "resize_feature",
           "read_feature_file", "FEATURE_SPECS", "Translator", "build_vocab"]
