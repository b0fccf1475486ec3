from .backbones import (MViTV2, MViTBlockSpec, MViTConfig, VideoResNet,
                        mvit_block_specs, mvit_v2_s, r2plus1d_18,
                        r2plus1d_34, r3d_18)
from .model import BACKBONES, TSPModel, tsp_cross_entropy
from .converter import (convert_mvit, convert_videoresnet,
                        load_torch_state_dict)
from .extractor import FeatureExtractor

__all__ = ["MViTV2", "MViTBlockSpec", "MViTConfig", "VideoResNet",
           "mvit_block_specs", "mvit_v2_s", "r2plus1d_18", "r2plus1d_34",
           "r3d_18", "BACKBONES", "TSPModel", "tsp_cross_entropy",
           "convert_mvit", "convert_videoresnet", "load_torch_state_dict",
           "FeatureExtractor"]
