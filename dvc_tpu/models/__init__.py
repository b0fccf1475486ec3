from .pdvc import PDVC, PDVCConfig
from .criterion import CriterionConfig, criterion_forward, build_weight_dict
from .matcher import MatcherConfig, hungarian_match
from .postprocess import postprocess, to_dvc_records

__all__ = [
    "PDVC", "PDVCConfig", "CriterionConfig", "criterion_forward",
    "build_weight_dict", "MatcherConfig", "hungarian_match",
    "postprocess", "to_dvc_records",
]
