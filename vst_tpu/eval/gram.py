"""Gram-matrix style distance (parity: AdaAttN/eval.py:70-108).

MSE between /(H·W)-normalized VGG19 Grams over the five relu*_1 taps,
averaged over taps.  Inputs are 0–255 NHWC RGB tensors.
"""

import jax
import jax.numpy as jnp

from vst_tpu.models import vgg as vgg_m
from vst_tpu.ops import gram_matrix_hw


@jax.jit
def gram_loss_5tap(vgg_params, img: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    fcs = vgg_m.vgg19_adaattn_features(vgg_params, img)
    fs = vgg_m.vgg19_adaattn_features(vgg_params, style)
    loss = 0.0
    for tap in fcs:
        g1 = gram_matrix_hw(fcs[tap])
        g2 = gram_matrix_hw(fs[tap])
        loss = loss + jnp.mean(jnp.square(g1 - g2))
    return loss / 5.0
