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
    flow_mse,
    sintel_optical_loss_terms,
    temporal_mse,
    temporal_error_sintel,
    warping_error_step,
    warping_error_terms,
)
from vst_tpu.eval.lpips import (
    image_to_lpips_input,
    load_linear_heads,
    lpips_distance,
    lpips_vgg,
)
from vst_tpu.eval.lpips_trainer import bce_ranking_loss, score_2afc
from vst_tpu.eval.inception import inception_blocks, init_inception
from vst_tpu.eval.sifid import frechet_distance, sifid

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
    "warping_error_terms",
    "sintel_optical_loss_terms",
    "flow_mse",
    "image_to_lpips_input",
    "load_linear_heads",
    "lpips_distance",
    "lpips_vgg",
    "bce_ranking_loss",
    "score_2afc",
    "inception_blocks",
    "init_inception",
    "frechet_distance",
    "sifid",
]
