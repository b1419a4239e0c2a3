"""Image-space math: ImageNet normalization, Gram matrices, luminance.

Parity targets:
- ``vgg_normalize``: ReCoNet/utilities.py:101-106 and
  AdaAttN/utilities.py:78-85 — (x/255 - mean) / std with ImageNet stats.
- ``gram_matrix``: ReCoNet/utilities.py:93-98 — normalized by (C·H·W).
- ``gram_matrix_hw``: RTNSTV/utilities.py:155-160 and AdaAttN/eval.py:70-76
  — normalized by (H·W) only.  The two sub-projects genuinely differ.
- Rec.709 luma weights: ReCoNet/train_single/train_candy.py:114.
"""

import jax.numpy as jnp

from vst_tpu.ops._precision import accum_dtype, matmul_precision

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def vgg_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize a 0–255 NHWC RGB tensor with ImageNet statistics."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    out = (x.astype(jnp.float32) / 255.0 - mean) / std
    return out.astype(x.dtype)


def _gram(y: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = y.shape
    acc = accum_dtype(y.dtype)
    f = y.reshape(n, h * w, c).astype(acc)
    return jnp.einsum("npc,npd->ncd", f, f,
                      preferred_element_type=acc,
                      precision=matmul_precision(y.dtype))


def gram_matrix(y: jnp.ndarray) -> jnp.ndarray:
    """Gram matrix of NHWC features normalized by (C·H·W) — ReCoNet flavor."""
    n, h, w, c = y.shape
    return _gram(y) / (c * h * w)


def gram_matrix_hw(y: jnp.ndarray) -> jnp.ndarray:
    """Gram matrix of NHWC features normalized by (H·W) — RTNSTV flavor."""
    n, h, w, c = y.shape
    return _gram(y) / (h * w)


def rgb_to_luma709(x: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance of an NHWC RGB tensor → (N, H, W)."""
    w = jnp.asarray([0.2126, 0.7152, 0.0722], dtype=jnp.float32)
    return jnp.einsum("nhwc,c->nhw", x.astype(jnp.float32), w)
