"""Content / style / regularization losses.

Parity targets:
- ReCoNet blocks: content on relu3_3, style Grams over 4 taps /(C·H·W),
  total-variation as a raw SUM — ReCoNet/train_single/train_candy.py:125-145.
- RTNSTV ``spatial_loss``: content on relu4_2, style Grams /(H·W),
  sqrt-TV with mean reduction — RTNSTV/train.py:36-60.

All functions are weight-free; trainers scale by their hyperparameters.
Tensors NHWC.
"""

import jax.numpy as jnp

from vst_tpu.ops import gram_matrix, gram_matrix_hw


def mse(a, b):
    """torch.nn.MSELoss(reduction="mean")."""
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def reconet_content_loss(styled_feats, content_feats, tap_index: int = 2):
    """MSE between tap ``tap_index`` (relu3_3) features of both frames'
    stylized vs content encodings; caller sums frames and scales by ALPHA."""
    return mse(styled_feats[tap_index], content_feats[tap_index])


def reconet_style_loss(styled_feats, style_grams):
    """Σ_taps MSE(gram(styled_tap), style_gram) with /(C·H·W) grams.

    ``style_grams``: list of (1, C, C) precomputed style-image grams
    (broadcasts over the batch, matching ``gram_s.expand`` in the reference).
    """
    loss = 0.0
    for feat, gs in zip(styled_feats, style_grams):
        loss = loss + mse(gram_matrix(feat), jnp.broadcast_to(
            gs, (feat.shape[0],) + gs.shape[1:]))
    return loss


def reconet_reg_loss(styled):
    """Total variation as a raw sum of squared neighbor diffs
    (train_candy.py:140-145: torch.sum, not mean)."""
    x = styled.astype(jnp.float32)
    reg1 = jnp.square(x[:, :-1, 1:, :] - x[:, :-1, :-1, :])
    reg2 = jnp.square(x[:, 1:, :-1, :] - x[:, :-1, :-1, :])
    return jnp.sum(reg1 + reg2)


def rtnstv_spatial_loss(content_feats, styled_feats, style_grams,
                        styled, alpha, beta, gamma):
    """RTNSTV/train.py:36-60 — returns (content, style, reg), pre-scaled.

    content_feats/styled_feats: dicts from vgg19_rtnstv_features.
    style_grams: list of (1, C, C) grams (H·W normalization) in tap order.
    """
    content_loss = mse(content_feats["relu4_2"], styled_feats["relu4_2"]) * alpha

    style_loss = 0.0
    for gs, feat in zip(style_grams, styled_feats.values()):
        gf = gram_matrix_hw(feat)
        style_loss = style_loss + mse(
            gf, jnp.broadcast_to(gs, (gf.shape[0],) + gs.shape[1:]))
    style_loss = style_loss * beta

    x = styled.astype(jnp.float32)
    reg1 = jnp.square(x[:, :-1, 1:, :] - x[:, :-1, :-1, :])
    reg2 = jnp.square(x[:, 1:, :-1, :] - x[:, :-1, :-1, :])
    reg_loss = jnp.mean(jnp.sqrt(jnp.clip(reg1 + reg2, min=1e-8))) * gamma

    return content_loss, style_loss, reg_loss
