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

Performance notes (measured on a v5e chip, batch 4).  TPU gathers are
fetch-COUNT bound (~14 cycles per gathered row regardless of small row
widths), so the formulation is channel-width dependent:

- **narrow tensors (C ≤ 32: images, flows)** use a corner-PACKED single
  gather: the four bilinear corners are materialized as channels of a
  zero-padded shifted copy, so one ``take_along_axis`` fetches a contiguous
  (1, 4·C) row holding the whole bilinear patch.  Bit-exact vs the
  per-corner form and **4.1× faster** at 640×360×3 (27.4 → 6.6 ms),
  2.5× at C=6.  This is NOT the previously-removed "(2, 2·C) patch
  lax.gather" (36× slower) — that one fetched two non-contiguous rows per
  index; the packed form pays 4 shifted copies (cheap elementwise) to make
  the patch contiguous.
- **wide tensors (features, C > 32)** keep four per-corner
  ``take_along_axis`` gathers (packing measured 0.83× at 160×90×192 — the
  4× bytes per fetch start to matter).
- a custom VJP computing the x-cotangent through a scatter-free
  sort+prefix-sum+binary-search splat (the MoE-dispatch pattern) was
  removed: the plain scatter-add transpose XLA derives is faster
  (≈120 ms vs ≈270 ms for a full-image splat; both ≈free at feature
  shapes).

Gradients go through plain JAX autodiff; they are parity-tested against
``torch.nn.functional.grid_sample`` autograd for both the input and the
grid cotangents (tests/test_ops_parity.py::TestWarp).
"""

import jax.numpy as jnp

_PACK_MAX_CHANNELS = 32


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

    if c <= _PACK_MAX_CHANNELS:
        # corner-packed single gather: one contiguous (1, 4c) row per pixel
        # holds the whole bilinear patch (see module docstring).  The +1
        # zero border makes every corner of any base in [-1, size-1]
        # addressable; fully-OOB bases are clipped onto garbage rows whose
        # weights are zero.
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        packed = jnp.concatenate(
            [xp[:, dy:dy + h + 1, dx:dx + w + 1]
             for dy in (0, 1) for dx in (0, 1)], axis=-1)
        bi = (jnp.clip(y0i + 1, 0, h) * (w + 1)
              + jnp.clip(x0i + 1, 0, w))
        rows = jnp.take_along_axis(
            packed.reshape(n, (h + 1) * (w + 1), 4 * c),
            bi.reshape(n, ho * wo, 1), axis=1)
        rows = rows.reshape(n, ho, wo, 4, c).astype(jnp.float32)
    else:
        xs = x.reshape(n, h * w, c)
        rows = None

    out = jnp.zeros((n, ho, wo, c), dtype=jnp.float32)
    corner = 0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0i + dx
            yi = y0i + dy
            wgt = (wx if dx else 1.0 - wx) * (wy if dy else 1.0 - wy)
            if padding_mode == "zeros":
                valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                wgt = jnp.where(valid, wgt, 0.0)
            if rows is not None:
                vals = rows[..., corner, :]
            else:
                xc = jnp.clip(xi, 0, w - 1)
                yc = jnp.clip(yi, 0, h - 1)
                idx = (yc * w + xc).reshape(n, ho * wo, 1)
                vals = jnp.take_along_axis(
                    xs.astype(jnp.float32), idx, axis=1
                ).reshape(n, ho, wo, c)
            out = out + vals * wgt[..., None]
            corner += 1
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
