"""Temporal-consistency metrics.

- ``temporal_mse`` — video frame-delta MSE (ReCoNet/utilities.py:126-176,
  RTNSTV/utilities.py:243-293): mean over adjacent pairs of
  MSE(content_delta, styled_delta).
- ``temporal_error_sintel`` — Et: per-pair mean of occlusion-masked squared
  error between styled frame t and GT-flow-warped styled frame t+1, averaged
  over pairs, then sqrt (RTNSTV/utilities.py:194-240).
- ``warping_error_step`` — RAFT/precomputed-flow warping error contribution
  per frame pair (AdaAttN/exps_video.py:106-111): Σ mask·(cs2−warp(cs1))² /
  (C·H·W); callers accumulate and finish with sqrt(total/count).
  Also returns the flow-MSE term (exps_video.py:114).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from vst_tpu.ops import warp


def temporal_mse(model_fn, frames, input_frame_num: int = 1) -> float:
    """model_fn: (1, H, W, 3·f) → styled (1, H, W, 3), clamped.
    frames: iterator of HWC RGB float 0–255 arrays."""
    frames = iter(frames)
    window = []
    for _ in range(input_frame_num):
        window.append(next(frames))

    prev = None
    total, count = 0.0, 0
    while True:
        inp = np.concatenate(window, axis=-1)[None]
        styled = np.asarray(model_fn(inp))[0]
        content = window[-1]
        if prev is not None:
            x = content - prev[0]
            y = styled - prev[1]
            total += float(np.mean((x - y) ** 2))
            count += 1
        prev = (content, styled)
        try:
            nxt = next(frames)
        except StopIteration:
            break
        window.pop(0)
        window.append(nxt)
    return total / count


@jax.jit
def _et_pair(styled0, styled1, flow, mask):
    warped = warp(styled1, flow)
    cmask = jnp.broadcast_to(mask[..., None], styled0.shape)
    err = cmask * jnp.square(styled0.astype(jnp.float32) -
                             warped.astype(jnp.float32))
    return jnp.mean(err)


def temporal_error_sintel(model_fn, frames, flows, occlusion_masks) -> float:
    """frames: list of HWC RGB 0–255; flows[i]: (H, W, 2) GT flow t→t+1;
    occlusion_masks[i]: (H, W) with 1 = non-occluded (mask==0 pixels of the
    Sintel occlusion PNG, RTNSTV/utilities.py:228-230)."""
    error = 0.0
    n = len(flows)
    styled = [np.asarray(model_fn(f[None]))[0] for f in frames]
    for i in range(n):
        error += float(_et_pair(
            jnp.asarray(styled[i])[None], jnp.asarray(styled[i + 1])[None],
            jnp.asarray(flows[i])[None],
            jnp.asarray(occlusion_masks[i], dtype=jnp.float32)[None]))
    return float(np.sqrt(error / n))


@jax.jit
def warping_error_step(cs1, cs2, flow_10, mask):
    """One frame-pair contribution: (masked-SSE/(C·H·W), count=1).

    cs1/cs2: (1, H, W, 3) styled frames; flow_10: (1, H, W, 2) backward flow;
    mask: (1, H, W).
    """
    warped = warp(cs1, flow_10)
    cmask = jnp.broadcast_to(mask[..., None], cs1.shape)
    n, h, w, c = cs1.shape
    loss = jnp.sum(cmask * jnp.square(cs2.astype(jnp.float32) -
                                      warped.astype(jnp.float32)))
    return loss / (c * h * w)


@functools.partial(jax.jit, static_argnames=("use_mae",))
def sintel_optical_loss_step(cs1_01, cs2_01, flow_10, mask, use_mae=True):
    """One AdaAttN-Sintel frame-pair term (AdaAttN/exps_sintel.py:91-101).

    cs1_01/cs2_01: (1, H, W, 3) stylized frames scaled to 0–1;
    flow_10 backward flow; mask (1, H, W).  Accumulate the returned values
    and finish with sqrt(total)/count (exps_sintel.py:110).
    ``use_mae=False`` selects the commented MSE variant.
    """
    warped = warp(cs1_01, flow_10)
    cmask = jnp.broadcast_to(mask[..., None], cs1_01.shape)
    diff = cs2_01.astype(jnp.float32) - warped.astype(jnp.float32)
    err = jnp.abs(diff) if use_mae else jnp.square(diff)
    n, h, w, c = cs1_01.shape
    return jnp.sum(cmask * err) / (c * h * w)


def flow_mse(flow_a, flow_b) -> float:
    """MSE between two flow fields (AdaAttN/exps_video.py:114)."""
    return float(np.mean((np.asarray(flow_a, np.float32) -
                          np.asarray(flow_b, np.float32)) ** 2))
