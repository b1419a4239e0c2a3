"""Backward warping and occlusion masks via bilinear grid sampling (NHWC).

Parity targets (numerics must match the reference exactly — these feed every
temporal loss and every temporal-consistency metric):

- ``warp``: ReCoNet/utilities.py:39-57 (identical in RTNSTV/AdaAttN):
  pixel grid + flow, normalized by 2/(dim-1) - 1, then
  ``F.grid_sample(mode="bilinear", padding_mode="zeros",
  align_corners=False)``.  Note the reference's (deliberate or not) mix of
  (dim-1) normalization with align_corners=False unnormalization — both steps
  are reproduced literally.
- ``flow_warp_mask``: ReCoNet/utilities.py:60-90 /
  RTNSTV/utilities.py:80-110 (adds ``threshold`` parameter): forward-backward
  consistency, L1 round-trip error < threshold.

Everything runs in-graph on device; the reference computed masks on CPU
DataLoader workers.

Performance note (measured on a v5e chip, batch 4): the four per-corner
``take_along_axis`` gathers are the FAST formulation — 54 ms forward at
640×360×3 and 30 ms at 160×90×96.  Two alternatives were built, measured,
and removed as pessimizations:

- a "fused" single ``lax.gather`` fetching each pixel's (2, 2·C) bilinear
  patch in one gather row — 36× SLOWER at image shapes (1948 ms vs 54 ms)
  and 4× slower at feature shapes; TPU gather throughput is not simply
  per-row, and the multi-dim patch gather lowers pathologically at scale;
- a custom VJP computing the x-cotangent through a scatter-free
  sort+prefix-sum+binary-search splat (the MoE-dispatch pattern) — the
  plain per-corner scatter-add transpose XLA derives from this forward is
  FASTER (≈120 ms vs ≈270 ms for a full-image splat; both ≈free at
  feature shapes).

Gradients therefore go through plain JAX autodiff; they are parity-tested
against ``torch.nn.functional.grid_sample`` autograd for both the input and
the grid cotangents (tests/test_ops_parity.py::TestWarp).
"""

import jax.numpy as jnp


def grid_sample_bilinear(
    x: jnp.ndarray, grid: jnp.ndarray, padding_mode: str = "zeros"
) -> jnp.ndarray:
    """Sample NHWC tensor ``x`` at normalized grid positions (differentiable).

    x: (N, H, W, C);  grid: (N, Ho, Wo, 2) with grid[..., 0] = x-coord and
    grid[..., 1] = y-coord in [-1, 1].  Matches
    ``torch.nn.functional.grid_sample(mode="bilinear", align_corners=False)``
    with padding_mode "zeros" or "border".  Four per-corner gathers whose
    autodiff transpose is a per-corner scatter-add — the fastest measured
    formulation on TPU in both directions (see module docstring).
    """
    n, h, w, c = x.shape
    _, ho, wo, _ = grid.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    # align_corners=False unnormalization: src = ((g + 1) * size - 1) / 2
    fx = ((gx + 1.0) * w - 1.0) / 2.0
    fy = ((gy + 1.0) * h - 1.0) / 2.0
    if padding_mode == "border":
        fx = jnp.clip(fx, 0.0, w - 1.0)
        fy = jnp.clip(fy, 0.0, h - 1.0)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    xs = x.reshape(n, h * w, c)
    out = jnp.zeros((n, ho, wo, c), dtype=jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0i + dx
            yi = y0i + dy
            wgt = (wx if dx else 1.0 - wx) * (wy if dy else 1.0 - wy)
            if padding_mode == "zeros":
                valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                wgt = jnp.where(valid, wgt, 0.0)
            xc = jnp.clip(xi, 0, w - 1)
            yc = jnp.clip(yi, 0, h - 1)
            idx = (yc * w + xc).reshape(n, ho * wo, 1)
            vals = jnp.take_along_axis(
                xs.astype(jnp.float32), idx, axis=1
            ).reshape(n, ho, wo, c)
            out = out + vals * wgt[..., None]
    return out.astype(x.dtype)


def _pixel_grid(h: int, w: int) -> jnp.ndarray:
    """(H, W, 2) grid of (x, y) pixel coordinates, float32."""
    xx = jnp.arange(w, dtype=jnp.float32)
    yy = jnp.arange(h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xx, yy)  # each (H, W)
    return jnp.stack([gx, gy], axis=-1)


def warp(x: jnp.ndarray, flow: jnp.ndarray,
         padding_mode: str = "zeros") -> jnp.ndarray:
    """Backward-warp ``x`` by ``flow`` (both NHWC; flow last dim = (fx, fy)).

    Reference semantics (ReCoNet/utilities.py:39-57): vgrid = grid + flow,
    normalized with 2·v/(dim-1) - 1, sampled with align_corners=False, zeros
    padding.
    """
    n, h, w, _ = x.shape
    grid = _pixel_grid(h, w)[None] + flow.astype(jnp.float32)
    gx = 2.0 * grid[..., 0] / max(w - 1, 1) - 1.0
    gy = 2.0 * grid[..., 1] / max(h - 1, 1) - 1.0
    return grid_sample_bilinear(x, jnp.stack([gx, gy], axis=-1), padding_mode)


def flow_warp_mask(
    flow01: jnp.ndarray,
    flow10: jnp.ndarray,
    padding_mode: str = "zeros",
    threshold: float = 2.0,
) -> jnp.ndarray:
    """Occlusion mask from forward/backward flow consistency.

    flow01/flow10: (N, H, W, 2) or (H, W, 2).  Returns float mask of the same
    leading shape, (N, H, W) / (H, W): 1 where the forward-backward round trip
    error (L1 over the two flow channels) is under ``threshold``.

    Reference: ReCoNet/utilities.py:60-90 (threshold fixed at 2) and
    RTNSTV/utilities.py:80-110 (parameterized).
    """
    squeeze = flow01.ndim == 3
    if squeeze:
        flow01 = flow01[None]
        flow10 = flow10[None]
    n, h, w, _ = flow01.shape
    grid = _pixel_grid(h, w)[None]
    target = grid + flow01.astype(jnp.float32)  # where pixels land going 0→1
    vgrid = grid + flow10.astype(jnp.float32)
    gx = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
    gy = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
    warped = grid_sample_bilinear(
        target, jnp.stack([gx, gy], axis=-1), padding_mode
    )
    err = jnp.sum(jnp.abs(warped - grid), axis=-1)
    mask = (err < threshold).astype(jnp.float32)
    return mask[0] if squeeze else mask
