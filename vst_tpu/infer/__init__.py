"""Inference entry points (layer L5): single-image + streaming video."""

from vst_tpu.infer.image import (
    stylize_reconet,
    stylize_rtnstv,
    stylize_adaattn,
)
from vst_tpu.infer.video import StreamingStylizer, AdaAttNVideoStylizer

__all__ = [
    "stylize_reconet",
    "stylize_rtnstv",
    "stylize_adaattn",
    "StreamingStylizer",
    "AdaAttNVideoStylizer",
]
