"""Evaluation suite (layer L6): quantitative metrics matching AdaAttN/eval.py
plus the temporal metrics from ReCoNet/RTNSTV utilities."""

from vst_tpu.eval.ssim import ssim
from vst_tpu.eval.histogram import (
    compute_histogram,
    kl_divergence_rgb,
    nth_order_moment,
    uniformity,
    average_entropy,
)
from vst_tpu.eval.gram import gram_loss_5tap
from vst_tpu.eval.temporal import (
    temporal_mse,
    temporal_error_sintel,
    warping_error_step,
)

__all__ = [
    "ssim",
    "compute_histogram",
    "kl_divergence_rgb",
    "nth_order_moment",
    "uniformity",
    "average_entropy",
    "gram_loss_5tap",
    "temporal_mse",
    "temporal_error_sintel",
    "warping_error_step",
]
