"""Loss functions (layer L3)."""

from vst_tpu.losses.perceptual import (
    mse,
    reconet_content_loss,
    reconet_style_loss,
    reconet_reg_loss,
    rtnstv_spatial_loss,
)
from vst_tpu.losses.temporal import (
    reconet_feature_temporal_loss,
    reconet_output_temporal_loss,
    rtnstv_temporal_loss,
)
from vst_tpu.losses.adaattn import (
    global_stylized_loss,
    local_feature_loss,
    cosine_distance,
    image_similarity_loss,
)

__all__ = [
    "mse",
    "reconet_content_loss",
    "reconet_style_loss",
    "reconet_reg_loss",
    "rtnstv_spatial_loss",
    "reconet_feature_temporal_loss",
    "reconet_output_temporal_loss",
    "rtnstv_temporal_loss",
    "global_stylized_loss",
    "local_feature_loss",
    "cosine_distance",
    "image_similarity_loss",
]
