"""Pallas TPU kernels for the hot ops."""

from vst_tpu.kernels.adaattn_attention import softmax_attention_moments_pallas
from vst_tpu.kernels.head_conv import conv3x3_valid_pallas
from vst_tpu.kernels.res_block import residual_block_fused

__all__ = ["softmax_attention_moments_pallas", "conv3x3_valid_pallas",
           "residual_block_fused"]
