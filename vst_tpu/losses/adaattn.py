"""AdaAttN training losses.

Parity target: AdaAttN/lossfn.py:5-53.

- ``global_stylized_loss`` — per-channel spatial mean AND std distance.
  torch ``Tensor.std`` applies Bessel's correction (N-1); reproduced here.
- ``local_feature_loss`` — MSE vs the conv-free AdaAttN target.
- ``cosine_distance`` — channel×channel cosine distance matrix (+1e-6 eps,
  unlike the attention module which has none).
- ``image_similarity_loss`` — L1 between row-normalized distance matrices of
  consecutive frames, divided by pixel count.
"""

import jax.numpy as jnp

from vst_tpu.losses.perceptual import mse
from vst_tpu.ops._precision import accum_dtype, matmul_precision


def _spatial_mean_std(f):
    """Per-sample, per-channel mean/std over H·W with Bessel correction."""
    x = f.astype(jnp.float32)
    n, h, w, c = x.shape
    m = jnp.mean(x, axis=(1, 2))
    var = jnp.sum(jnp.square(x - m[:, None, None, :]), axis=(1, 2)) / (h * w - 1)
    return m, jnp.sqrt(var)


def global_stylized_loss(fcs, fs):
    """Mean+std distance between stylized-output and style features (one tap)."""
    m1, s1 = _spatial_mean_std(fcs)
    m2, s2 = _spatial_mean_std(fs)
    return mse(m1, m2) + mse(s1, s2)


def local_feature_loss(fcs, adaattn_target):
    return mse(fcs, adaattn_target)


def cosine_distance(fu, fv):
    """(b, c, c) channel-pair cosine distance (AdaAttN/lossfn.py:25-38).

    fu/fv: NHWC feature maps of identical shape.
    """
    b, h, w, c = fu.shape
    acc = accum_dtype(fu.dtype)
    u = fu.reshape(b, h * w, c).astype(acc)
    v = fv.reshape(b, h * w, c).astype(acc)
    dots = jnp.einsum("bpc,bpd->bcd", u, v,
                      preferred_element_type=acc,
                      precision=matmul_precision(fu.dtype))
    nu = jnp.sqrt(jnp.sum(jnp.square(u), axis=1))  # (b, c)
    nv = jnp.sqrt(jnp.sum(jnp.square(v), axis=1))  # (b, c)
    return 1.0 - dots / (nu[:, :, None] * nv[:, None, :] + 1e-6)


def image_similarity_loss(fc1, fc2, fcs1, fcs2):
    """Frame-pair similarity-structure preservation (AdaAttN/lossfn.py:41-53)."""
    n = fc1.shape[1] * fc1.shape[2]
    d_c = cosine_distance(fc1, fc2)
    d_cs = cosine_distance(fcs1, fcs2)
    d_c = d_c / jnp.sum(d_c, axis=1, keepdims=True)
    d_cs = d_cs / jnp.sum(d_cs, axis=1, keepdims=True)
    return jnp.sum(jnp.abs(d_c - d_cs)) / n
