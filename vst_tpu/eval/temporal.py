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
def _et_pairs(styled0, styled1, flow, mask):
    """Per-pair Et terms over a batch of frame pairs → (B,) means."""
    warped = warp(styled1, flow)
    cmask = jnp.broadcast_to(mask[..., None], styled0.shape)
    err = cmask * jnp.square(styled0.astype(jnp.float32) -
                             warped.astype(jnp.float32))
    return jnp.mean(err, axis=(1, 2, 3))


def map_batched(fn, stacked, batch_size: int):
    """Apply a jitted batch fn over ``stacked`` in FIXED-size chunks.

    The tail chunk is padded by repeating the last element so the whole run
    uses one compiled shape (a ragged final batch would recompile);
    padded outputs are dropped.  ``stacked`` may be a tuple of arrays
    sharing the leading dim.
    """
    args = stacked if isinstance(stacked, tuple) else (stacked,)
    n = args[0].shape[0]
    outs = []
    for i in range(0, n, batch_size):
        chunk = [a[i:i + batch_size] for a in args]
        pad = batch_size - chunk[0].shape[0]
        if pad:
            chunk = [np.concatenate([c, np.repeat(c[-1:], pad, axis=0)])
                     for c in chunk]
        out = np.asarray(fn(*chunk))
        outs.append(out[:batch_size - pad] if pad else out)
    return np.concatenate(outs)


def temporal_error_sintel(model_fn, frames, flows, occlusion_masks,
                          batch_size: int = 8) -> float:
    """frames: list of HWC RGB 0–255; flows[i]: (H, W, 2) GT flow t→t+1;
    occlusion_masks[i]: (H, W) with 1 = non-occluded (mask==0 pixels of the
    Sintel occlusion PNG, RTNSTV/utilities.py:228-230).

    All frames are stylized in ``batch_size`` chunks and all Et pair terms
    evaluated in batched dispatches (the reference loops batch-1 per frame,
    RTNSTV/utilities.py:208-236 — ~50 dispatches/scene over a TPU tunnel;
    here it is ~2·ceil(n/batch_size))."""
    n = len(flows)
    styled = map_batched(model_fn, np.stack(frames).astype(np.float32),
                         batch_size)
    per_pair = map_batched(
        _et_pairs,
        (styled[:-1], styled[1:], np.stack(flows).astype(np.float32),
         np.stack(occlusion_masks).astype(np.float32)),
        batch_size)
    return float(np.sqrt(float(per_pair.sum()) / n))


@jax.jit
def warping_error_step(cs1, cs2, flow_10, mask):
    """Frame-pair contribution(s): masked-SSE/(C·H·W), summed over batch.

    cs1/cs2: (B, H, W, 3) styled frames; flow_10: (B, H, W, 2) backward flow;
    mask: (B, H, W).  The sum over the batch equals the reference's
    accumulation of B per-pair terms (exps_video.py:106-111), so callers may
    batch pairs freely.
    """
    return jnp.sum(warping_error_terms(cs1, cs2, flow_10, mask))


@jax.jit
def warping_error_terms(cs1, cs2, flow_10, mask):
    """Per-pair warping-error terms → (B,) (batchable via map_batched)."""
    warped = warp(cs1, flow_10)
    cmask = jnp.broadcast_to(mask[..., None], cs1.shape)
    n, h, w, c = cs1.shape
    loss = jnp.sum(cmask * jnp.square(cs2.astype(jnp.float32) -
                                      warped.astype(jnp.float32)),
                   axis=(1, 2, 3))
    return loss / (c * h * w)


@functools.partial(jax.jit, static_argnames=("use_mae",))
def sintel_optical_loss_step(cs1_01, cs2_01, flow_10, mask, use_mae=True):
    """One AdaAttN-Sintel frame-pair term (AdaAttN/exps_sintel.py:91-101).

    cs1_01/cs2_01: (B, H, W, 3) stylized frames scaled to 0–1;
    flow_10 backward flow; mask (B, H, W).  Accumulate the returned values
    (the batch is summed, equal to B accumulated per-pair terms) and finish
    with sqrt(total)/count (exps_sintel.py:110).
    ``use_mae=False`` selects the commented MSE variant.
    """
    return jnp.sum(sintel_optical_loss_terms(cs1_01, cs2_01, flow_10, mask,
                                             use_mae))


@functools.partial(jax.jit, static_argnames=("use_mae",))
def sintel_optical_loss_terms(cs1_01, cs2_01, flow_10, mask, use_mae=True):
    """Per-pair AdaAttN-Sintel terms → (B,) (batchable via map_batched)."""
    warped = warp(cs1_01, flow_10)
    cmask = jnp.broadcast_to(mask[..., None], cs1_01.shape)
    diff = cs2_01.astype(jnp.float32) - warped.astype(jnp.float32)
    err = jnp.abs(diff) if use_mae else jnp.square(diff)
    n, h, w, c = cs1_01.shape
    return jnp.sum(cmask * err, axis=(1, 2, 3)) / (c * h * w)


def flow_mse(flow_a, flow_b) -> float:
    """MSE between two flow fields (AdaAttN/exps_video.py:114)."""
    return float(np.mean((np.asarray(flow_a, np.float32) -
                          np.asarray(flow_b, np.float32)) ** 2))
