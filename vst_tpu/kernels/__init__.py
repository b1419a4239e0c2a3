"""Pallas TPU kernels for the hot ops."""

from vst_tpu.kernels.adaattn_attention import softmax_attention_moments_pallas

__all__ = ["softmax_attention_moments_pallas"]
