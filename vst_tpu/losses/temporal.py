"""Optical-flow temporal consistency losses — fully in-graph on device.

Parity targets:
- Feature-map-level temporal loss (FTL):
  ReCoNet/train_single/train_candy.py:91-106 — flow bilinearly resized to the
  feature map and rescaled per-axis, features warped, occlusion mask resized
  and re-binarized (>0), masked squared error divided by the COUNT of nonzero
  mask elements.
- Output-level temporal loss (OTL): train_candy.py:108-123 — computed on
  vgg-normalized images, with the input term relaxed to Rec.709 luminance.
- RTNSTV masked output temporal loss: RTNSTV/train.py:117-133 — on 0–255
  images, divided by mask SUM (+1e-8).
"""

import jax.numpy as jnp

from vst_tpu.ops import resize_bilinear, rgb_to_luma709, warp


def reconet_feature_temporal_loss(feature_map1, feature_map2, flow, mask):
    """FTL between consecutive frames' encoder features.

    feature_map1/2: (N, Hf, Wf, C); flow: (N, H, W, 2) image-resolution
    flow; mask: (N, H, W) occlusion mask.  Returns unweighted loss (caller
    scales by LAMBDA_F).
    """
    n, hf, wf, c = feature_map1.shape
    h, w = flow.shape[1:3]
    feature_flow = resize_bilinear(flow, (hf, wf))
    scale = jnp.asarray([wf / w, hf / h], dtype=jnp.float32)
    feature_flow = feature_flow * scale
    warped = warp(feature_map1, feature_flow)

    fmask = resize_bilinear(mask[..., None], (hf, wf))[..., 0]
    fmask = (fmask > 0).astype(jnp.float32)
    fmask = jnp.broadcast_to(fmask[..., None], feature_map1.shape)

    err = jnp.square(feature_map2.astype(jnp.float32) -
                     warped.astype(jnp.float32))
    loss = jnp.sum(fmask * err)
    non_zero = jnp.count_nonzero(fmask)
    return loss / non_zero.astype(jnp.float32)


def reconet_output_temporal_loss(img1n, img2n, styled1n, styled2n, flow, mask):
    """OTL with luminance-relaxed input term (train_candy.py:108-123).

    All four image tensors are ALREADY vgg-normalized (N, H, W, 3), exactly
    as in the reference, which normalizes before warping.
    """
    warped_style = warp(styled1n, flow)
    warped_image = warp(img1n, flow)
    output_term = styled2n.astype(jnp.float32) - warped_style.astype(jnp.float32)
    input_term = img2n.astype(jnp.float32) - warped_image.astype(jnp.float32)
    luma = rgb_to_luma709(input_term)
    input_term = jnp.broadcast_to(luma[..., None], output_term.shape)

    cmask = jnp.broadcast_to(mask[..., None], output_term.shape)
    loss = jnp.sum(cmask * jnp.square(output_term - input_term))
    non_zero = jnp.count_nonzero(cmask)
    return loss / non_zero.astype(jnp.float32)


def rtnstv_temporal_loss(styled1, styled2, flow, mask):
    """Masked output temporal loss on 0–255 images (RTNSTV/train.py:117-133).

    Divides by mask SUM over the channel-expanded mask (+1e-8), not the
    nonzero count.
    """
    cmask = jnp.broadcast_to(mask[..., None], styled2.shape).astype(jnp.float32)
    non_zero = jnp.sum(cmask) + 1e-8
    warped = warp(styled1, flow)
    err = jnp.square(styled2.astype(jnp.float32) - warped.astype(jnp.float32))
    return jnp.sum(cmask * err) / non_zero
