from .ms_deform_attn import (
    ms_deform_attn,
    ms_deform_attn_ref,
    ms_deform_attn_dense,
    ms_deform_attn_pallas,
    ms_deform_attn_sample_values,
)
from .assignment import linear_sum_assignment, masked_assignment

__all__ = [
    "ms_deform_attn",
    "ms_deform_attn_ref",
    "ms_deform_attn_dense",
    "ms_deform_attn_pallas",
    "ms_deform_attn_sample_values",
    "linear_sum_assignment",
    "masked_assignment",
]
