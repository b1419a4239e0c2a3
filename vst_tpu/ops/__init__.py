"""Core numeric/image ops (layer L0 of SURVEY.md §1).

All ops take NHWC tensors and match the reference's PyTorch numerics
(documented per-function with reference file:line citations).
"""

from vst_tpu.ops.pad import reflection_pad2d
from vst_tpu.ops.conv import (
    conv2d,
    conv2d_nearest_up2,
    conv2d_polyphase,
    conv2d_polyphase_reflect,
    conv2d_reflect1_k3s1,
    conv2d_reflect1_k3s2,
    conv_transpose2d,
    max_pool2d,
)
from vst_tpu.ops.norm import instance_norm
from vst_tpu.ops.resize import resize_bilinear, upsample_nearest
from vst_tpu.ops.warp import grid_sample_bilinear, warp, flow_warp_mask
from vst_tpu.ops.image import (
    vgg_normalize,
    gram_matrix,
    gram_matrix_hw,
    rgb_to_luma709,
)
from vst_tpu.ops.features import feature_down_sample
from vst_tpu.ops.yuv import i420_to_rgb, rgb_to_i420

__all__ = [
    "reflection_pad2d",
    "conv2d",
    "conv2d_nearest_up2",
    "conv2d_polyphase",
    "conv2d_polyphase_reflect",
    "conv2d_reflect1_k3s1",
    "conv2d_reflect1_k3s2",
    "i420_to_rgb",
    "rgb_to_i420",
    "conv_transpose2d",
    "max_pool2d",
    "instance_norm",
    "resize_bilinear",
    "upsample_nearest",
    "grid_sample_bilinear",
    "warp",
    "flow_warp_mask",
    "vgg_normalize",
    "gram_matrix",
    "gram_matrix_hw",
    "rgb_to_luma709",
    "feature_down_sample",
]
