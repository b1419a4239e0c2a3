"""Multi-scale feature pyramid helpers.

Parity target: ``feature_down_sample`` — AdaAttN/utilities.py:98-109:
bilinearly downsample VGG taps 0..n-1 to tap n's spatial size and concatenate
along channels (torch dim=1 ↔ NHWC last axis).
"""

from collections.abc import Sequence

import jax.numpy as jnp

from vst_tpu.ops.resize import resize_bilinear


def feature_down_sample(
    feats: Sequence[jnp.ndarray], last_feat_idx: int
) -> jnp.ndarray:
    """Concat feats[0..last_feat_idx] all resized to feats[last_feat_idx]'s
    spatial size (NHWC)."""
    target = feats[last_feat_idx]
    size = target.shape[1:3]
    parts = [resize_bilinear(feats[i], size) for i in range(last_feat_idx)]
    parts.append(target)
    return jnp.concatenate(parts, axis=-1)
