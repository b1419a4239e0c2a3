"""Convolution primitives (NHWC / HWIO — TPU native layout).

Parity targets:
- ``torch.nn.Conv2d`` (VALID padding; reflection padding is applied separately
  by the caller, see ReCoNet/network.py:63-75).
- ``torch.nn.ConvTranspose2d(k, s, padding=1, output_padding=1)`` as used by
  the RTNSTV decoder (RTNSTV/network.py:48-60).
- ``torch.nn.MaxPool2d(2, 2)`` inside the VGG backbones.

Weights are stored HWIO.  The compat layer converts torch's OIHW
(Conv2d) / IOHW (ConvTranspose2d) layouts — see vst_tpu/compat/torch_params.py.

All matmul-bearing ops accumulate in float32 (``preferred_element_type``) so
bfloat16 activations keep full-precision accumulation on the MXU.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vst_tpu.ops._precision import conv_accum_dtype, matmul_precision

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: str | int = "VALID",
) -> jnp.ndarray:
    """2-D convolution, NHWC input, HWIO weight.

    ``padding`` may be "VALID"/"SAME" or an integer of symmetric zero padding
    (torch Conv2d ``padding=p`` semantics).
    """
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_DIMNUMS,
        preferred_element_type=conv_accum_dtype(x.dtype),
        precision=matmul_precision(x.dtype),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 2,
    padding: int = 1,
    output_padding: int = 1,
) -> jnp.ndarray:
    """Transposed convolution matching ``torch.nn.ConvTranspose2d``.

    ``w`` is HWIO with I = input channels of this layer (i.e. already
    converted from torch's (in, out, kh, kw) and spatially flipped by the
    compat layer).  Implemented as the standard input-dilated convolution:
    lhs_dilation = stride, per-edge padding (k-1-p, k-1-p+output_padding).

    Output size: (in-1)*stride - 2*padding + k + output_padding, exactly as
    torch (RTNSTV/network.py:51 uses k=3, s=2, p=1, op=1 → 2× upsampling).
    """
    k = w.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(lo, hi), (lo, hi)],
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=conv_accum_dtype(x.dtype),
        precision=matmul_precision(x.dtype),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def _polyphase_weights(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """Scatter a k×k HWIO kernel into the (t×t, f²·Cin → f²·Cout) packed
    form: W2[di,dj,(p,q,cin),(a,b,cout)] = w[f·di+p-a, f·dj+q-b]
    (zero outside [0, k))."""
    k, _, cin, cout = w.shape
    t = (k + f - 2) // f + 1
    pad = f - 1
    w_pad = jnp.pad(w.astype(jnp.float32),
                    ((pad, pad), (pad, pad), (0, 0), (0, 0)))
    di = np.arange(t)[:, None, None]
    p = np.arange(f)[None, :, None]
    a = np.arange(f)[None, None, :]
    idx = f * di + p - a + pad                          # (t, f, f)
    g = jnp.take(w_pad, jnp.asarray(idx.reshape(-1)), axis=0)
    g = g.reshape(t, f, f, k + 2 * pad, cin, cout)
    g = jnp.take(g, jnp.asarray(idx.reshape(-1)), axis=3)
    g = g.reshape(t, f, f, t, f, f, cin, cout)          # [di,p,a,dj,q,b,c,o]
    return g.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(
        t, t, f * f * cin, f * f * cout).astype(w.dtype)


def conv2d_polyphase(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    factor: int = 4,
) -> jnp.ndarray:
    """Stride-1 VALID conv via space-to-depth polyphase decomposition.

    Mathematically identical to ``conv2d(x, w, stride=1, padding=VALID)``
    but with the k×k kernel re-scattered into a (t×t, f²·Cin → f²·Cout)
    conv on the f×-space-to-depth'd input.  This packs f² output pixels
    into the channel dimension, so convs with tiny channel counts (ReCoNet's
    9×9 3→48 stem and 48→3 ConvTanh head — which otherwise use 3/128 MXU
    output lanes) run at ~f²× better MXU utilization.  Profiled on v5e:
    the 48→3 head drops from 4.2 ms to sub-ms per 512² frame.

    Requirements (else use plain conv2d): output H/W divisible by ``factor``
    and factor | (k-1), which holds for the k=9 layers at all standard
    resolutions.
    """
    f = factor
    k, _, cin, cout = w.shape
    n, hp, wp, _ = x.shape
    oh, ow = hp - k + 1, wp - k + 1
    t = (k + f - 2) // f + 1
    assert oh % f == 0 and ow % f == 0 and f * (t - 1) == k - 1, (
        "conv2d_polyphase preconditions violated")

    w2 = _polyphase_weights(w, f)

    # space-to-depth input
    xs = x.reshape(n, hp // f, f, wp // f, f, cin)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // f, wp // f,
                                                f * f * cin)
    # NOTE: a Pallas kernel for this packed conv (kernels/head_conv.py) was
    # measured 2.2× SLOWER than XLA here (0.61 vs 0.28 ms/frame on the 512²
    # head form) — the conv itself is NOT the head's bottleneck, the
    # pad/pack/unpack layout ops around it are (BENCH.md roofline).
    out = lax.conv_general_dilated(
        xs, w2, (1, 1), "VALID", dimension_numbers=_DIMNUMS,
        preferred_element_type=conv_accum_dtype(x.dtype),
        precision=matmul_precision(x.dtype),
    )
    # depth-to-space output
    out = out.reshape(n, oh // f, ow // f, f, f, cout)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, oh, ow, cout)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def conv2d_polyphase_reflect(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    factor: int = 4,
) -> jnp.ndarray:
    """``reflect-pad(k//2) then conv2d_polyphase`` WITHOUT the pad copy.

    The head profile (BENCH.md roofline) showed the full-tensor reflect pad
    costs more than the packed conv itself (0.30 vs 0.28 ms/frame at 512²).
    When pad == factor (k=9, f=4), the padded-then-packed tensor is the
    packed unpadded tensor plus a ONE-packed-pixel border whose phase
    channels are a gather of existing packed rows/cols:
    original row −1−t reflects to row 1+t, so border row-phase q holds
    original row f−q → packed (row (f−q)//f, phase (f−q)%f); symmetrically
    at the bottom/right.  Borders are ~0.8 MB of slicing instead of a
    25 MB repad of the whole activation.

    For wide inputs (f²·cin ≥ 768, i.e. ReCoNet's 48-ch head) the input is
    materialized through an ``optimization_barrier`` before the phase
    slicing: when x is a produced activation (deconv2's IN+relu chain
    feeding the head), the many border/phase consumers otherwise make XLA
    re-fuse that producer chain into each consumer — measured 0.93 → 0.72
    ms/frame on the head stage at 512², bit-exact (headline 259 → 271.5
    fps).  On the narrow distilled-student heads the materialization costs
    more than the re-fusion (SD2: 553 → 528 fps), hence the width gate
    (BENCH.md round 3).
    """
    f = factor
    k, _, cin, cout = w.shape
    assert k == 2 * f + 1, (k, f)  # pad = k//2 must equal f
    if f * f * cin >= 768:
        x = lax.optimization_barrier(x)
    n, h, wdt, _ = x.shape
    assert h % f == 0 and wdt % f == 0
    H, W = h // f, wdt // f

    p6 = x.reshape(n, H, f, W, f, cin).transpose(0, 1, 3, 2, 4, 5)
    # (n, H, W, row_phase, col_phase, c)

    def row(i, p):
        return p6[:, i, :, p]                     # (n, W, f, c)

    top = jnp.stack([row(1, 0)] + [row(0, f - q) for q in range(1, f)],
                    axis=2)[:, None]              # (n, 1, W, f, f, c)
    bot_src = [((f * H - 2 - q) // f, (f * H - 2 - q) % f)
               for q in range(f)]
    bottom = jnp.stack([row(i, p) for i, p in bot_src], axis=2)[:, None]
    p6 = jnp.concatenate([top, p6, bottom], axis=1)   # (n, H+2, W, f, f, c)

    def col(j, p):
        return p6[:, :, j, :, p]                  # (n, H+2, f, c)

    left = jnp.stack([col(1, 0)] + [col(0, f - q) for q in range(1, f)],
                     axis=3)[:, :, None]          # (n, H+2, 1, f, f, c)
    right_src = [((f * W - 2 - q) // f, (f * W - 2 - q) % f)
                 for q in range(f)]
    right = jnp.stack([col(j, p) for j, p in right_src],
                      axis=3)[:, :, None]
    p6 = jnp.concatenate([left, p6, right], axis=2)   # (n, H+2, W+2, f, f, c)

    xs = p6.reshape(n, H + 2, W + 2, f * f * cin)
    w2 = _polyphase_weights(w, f)
    out = lax.conv_general_dilated(
        xs, w2, (1, 1), "VALID", dimension_numbers=_DIMNUMS,
        preferred_element_type=conv_accum_dtype(x.dtype),
        precision=matmul_precision(x.dtype),
    )
    out = out.reshape(n, H, W, f, f, cout)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, wdt, cout)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def conv2d_nearest_up2(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused [nearest ×2 upsample → reflection-pad(1) → 3×3 conv].

    Exactly equivalent to ReCoNet's UpsampleConvLayer body
    (ReCoNet/network.py:101-120) but computed as a 4-phase polyphase conv on
    the LOW-res input: because nearest-×2 duplicates pixels, each output
    phase (a, b) reduces to a 3×3-tap conv on the edge-padded original with
    phase-summed weights (reflection padding on the upsampled image is
    identical to edge padding on the original — indices −1 and 2H map to
    pixels 0 and H−1 either way).  This skips materializing the 4×-size
    upsampled intermediate (50 MB/frame at 512p for deconv2) entirely.
    """
    k, _, cin, cout = w.shape
    assert k == 3, "fused upsample-conv is specialized for 3x3 kernels"
    n, h, ww_, _ = x.shape
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    # T[a, di, u] = 1 iff upsampled tap u of output phase a reads
    # low-res offset di-1:  (a + u - 1) // 2 == di - 1.
    T = np.zeros((2, 3, 3), np.float32)
    for a in range(2):
        for u in range(3):
            T[a, (a + u - 1) // 2 + 1, u] = 1.0
    Tj = jnp.asarray(T)
    w2 = jnp.einsum("adu,bev,uvco->deabco", Tj, Tj, w.astype(jnp.float32))
    w2 = w2.transpose(0, 1, 4, 2, 3, 5).reshape(3, 3, cin, 4 * cout)
    w2 = w2.astype(w.dtype)

    out = lax.conv_general_dilated(
        x_pad, w2, (1, 1), "VALID", dimension_numbers=_DIMNUMS,
        preferred_element_type=conv_accum_dtype(x.dtype),
        precision=matmul_precision(x.dtype),
    )
    out = out.reshape(n, h, ww_, 2, 2, cout)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * ww_, cout)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def conv2d_nearest_up2_2tap(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[nearest ×2 upsample → reflection-pad(1) → 3×3 conv], 2×2-collapsed.

    Same math as :func:`conv2d_nearest_up2` (ReCoNet/network.py:101-120),
    but exploits that each output phase's 3 upsampled taps collapse onto
    only TWO distinct low-res rows (cols): the per-phase kernels are 2×2
    with phase-summed weights — 4/9 the taps, i.e. 0.44× the mathematical
    FLOPs of the direct upsample-then-conv form (conv2d_nearest_up2's
    phase-summed 3×3 carries the other 5 taps as structural zeros).  One
    2×2 VALID conv over the edge-padded input computes all four phases
    (4·cout output lanes at low resolution); each phase then selects its
    shifted h×w window before the interleave.
    """
    k, _, cin, cout = w.shape
    assert k == 3, "fused upsample-conv is specialized for 3x3 kernels"
    n, h, ww_, _ = x.shape
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    # S[a, t, u] = 1 iff upsampled tap u of output phase a collapses onto
    # window-local low-res row t of the phase's 2-row window (which starts
    # at padded row i+a):  t = (a + u - 1) // 2 - a + 1.
    S = np.zeros((2, 2, 3), np.float32)
    for a in range(2):
        for u in range(3):
            S[a, (a + u - 1) // 2 - a + 1, u] = 1.0
    Sj = jnp.asarray(S)
    w2 = jnp.einsum("atu,bsv,uvco->tsabco", Sj, Sj, w.astype(jnp.float32))
    w2 = w2.transpose(0, 1, 4, 2, 3, 5).reshape(2, 2, cin, 4 * cout)
    w2 = w2.astype(w.dtype)

    y = lax.conv_general_dilated(
        x_pad, w2, (1, 1), "VALID", dimension_numbers=_DIMNUMS,
        preferred_element_type=conv_accum_dtype(x.dtype),
        precision=matmul_precision(x.dtype),
    )
    y = y.reshape(n, h + 1, ww_ + 1, 2, 2, cout)
    p00 = y[:, :h, :ww_, 0, 0]
    p01 = y[:, :h, 1:, 0, 1]
    p10 = y[:, 1:, :ww_, 1, 0]
    p11 = y[:, 1:, 1:, 1, 1]
    out = jnp.stack(
        [jnp.stack([p00, p01], axis=3), jnp.stack([p10, p11], axis=3)],
        axis=3)                                   # (n, h, w, a, b, cout)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * ww_, cout)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def conv2d_k3s2_s2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """3×3 stride-2 VALID conv via 2×-space-to-depth.

    Equivalent to ``conv2d(x, w, stride=2, padding=VALID)`` for 3×3 kernels
    on even-height/width padded inputs: the stride-2 conv becomes a 2×2-tap
    conv over (4·Cin) s2d channels, quadrupling the MXU contraction depth
    for the narrow early encoder layers (e.g. ReCoNet conv2, 48→96 at
    512²).
    """
    k, _, cin, cout = w.shape
    assert k == 3
    n, hp, wp, _ = x.shape
    assert hp % 2 == 0 and wp % 2 == 0
    xs = x.reshape(n, hp // 2, 2, wp // 2, 2, cin)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * cin)

    # W2[di, dj, (p,q,c), o] = w[2di+p, 2dj+q, c, o]  (zero beyond k-1)
    w_pad = jnp.pad(w.astype(jnp.float32), ((0, 1), (0, 1), (0, 0), (0, 0)))
    idx = np.array([[0, 1], [2, 3]])  # [di, p] → 2di+p
    g = jnp.take(w_pad, jnp.asarray(idx.reshape(-1)), axis=0)
    g = g.reshape(2, 2, 4, cin, cout)                 # [di, p, u4, c, o]
    g = jnp.take(g, jnp.asarray(idx.reshape(-1)), axis=2)
    g = g.reshape(2, 2, 2, 2, cin, cout)              # [di, p, dj, q, c, o]
    w2 = g.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * cin, cout)
    w2 = w2.astype(w.dtype)

    out = lax.conv_general_dilated(
        xs, w2, (1, 1), "VALID", dimension_numbers=_DIMNUMS,
        preferred_element_type=conv_accum_dtype(x.dtype),
        precision=matmul_precision(x.dtype),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def conv2d_reflect1_k3s2(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """3×3 stride-2 conv with reflection padding 1 — pad-copy-free.

    Equivalent to ``conv2d(reflection_pad2d(x, 1), w, stride=2)`` for even
    H/W, but materializing the reflect-padded tensor costs more than the
    conv itself at 512p (a ~50 MB copy that also blocks input fusion).
    Only output row 0 and column 0 ever see reflected samples at stride 2
    (row -1 ↦ row 1, col -1 ↦ col 1; the bottom/right windows stay
    interior), so: interior = VALID conv on x[1:, 1:]; the first row/col
    are two skinny VALID convs over explicitly reflected 3-wide slabs.
    Profiled on v5e: 0.49 → ~0.15 ms/frame for ReCoNet conv2.
    """
    n, h, ww_, cin = x.shape
    assert h % 2 == 0 and ww_ % 2 == 0 and w.shape[0] == 3

    def cv(inp, strides):
        return lax.conv_general_dilated(
            inp, w, strides, "VALID", dimension_numbers=_DIMNUMS,
            preferred_element_type=conv_accum_dtype(x.dtype),
            precision=matmul_precision(x.dtype),
        )

    main = cv(x[:, 1:, 1:], (2, 2))                     # out[1:, 1:]

    top_rows = jnp.concatenate(
        [x[:, 1:2], x[:, 0:2]], axis=1)                 # rows (-1,0,1)
    top_slab = jnp.concatenate(
        [top_rows[:, :, 1:2], top_rows], axis=2)        # left col reflect
    top = cv(top_slab, (1, 2))                          # out[0:1, :]

    left_cols = jnp.concatenate(
        [x[:, 1:, 1:2], x[:, 1:, 0:2]], axis=2)         # cols (-1,0,1)
    left = cv(left_cols, (2, 1))                        # out[1:, 0:1]

    out = jnp.concatenate(
        [top, jnp.concatenate([left, main], axis=2)], axis=1)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def conv2d_reflect1_k3s2_dus(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """``conv2d_reflect1_k3s2`` with the border ring written by
    dynamic-update-slice instead of output concatenation.

    One DENSE conv with explicit asymmetric zero padding ((1,0),(1,0))
    produces every output except row 0 / column 0 (which read the
    reflected row/col -1); those are overwritten with exact skinny-conv
    strips.  Candidate (queued on-chip): the split-border form's two
    output concats sit between the conv and its IN+relu consumers, and
    the round-3 stage profile attributes 0.23 of conv2's 0.56 ms/frame
    to border handling vs a 0.33 ms plain zero-pad conv — if XLA fuses
    through the DUS chain better than through concat, most of that gap
    closes.  Bit-parity with conv2d_reflect1_k3s2 is tested; in-model
    A/B via tools/bench_conv2_dus.py."""
    n, h, ww_, cin = x.shape
    assert h % 2 == 0 and ww_ % 2 == 0 and w.shape[0] == 3

    def cv(inp, strides, padding="VALID"):
        return lax.conv_general_dilated(
            inp, w, strides, padding, dimension_numbers=_DIMNUMS,
            preferred_element_type=conv_accum_dtype(x.dtype),
            precision=matmul_precision(x.dtype),
        )

    dense = cv(x, (2, 2), ((1, 0), (1, 0)))             # all but ring exact

    top_rows = jnp.concatenate(
        [x[:, 1:2], x[:, 0:2]], axis=1)                 # rows (-1,0,1)
    top_slab = jnp.concatenate(
        [top_rows[:, :, 1:2], top_rows], axis=2)        # left col reflect
    top = cv(top_slab, (1, 2))                          # out[0:1, :]

    left_rows = jnp.concatenate([x[:, 1:2], x], axis=1)  # row reflect
    left_cols = jnp.concatenate(
        [left_rows[:, :, 1:2], left_rows[:, :, 0:2]], axis=2)
    left = cv(left_cols, (2, 1))                        # out[:, 0:1]

    out = lax.dynamic_update_slice(dense, top.astype(dense.dtype),
                                   (0, 0, 0, 0))
    out = lax.dynamic_update_slice(out, left.astype(dense.dtype),
                                   (0, 0, 0, 0))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def conv2d_reflect1_k3s1(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """3×3 stride-1 conv with reflection padding 1 — pad-copy-free.

    Equivalent to ``conv2d(reflection_pad2d(x, 1), w)``: interior = VALID
    conv on x; the four border rows/cols are skinny VALID convs over
    explicitly reflected 3-wide slabs (corners handled by width-reflecting
    the top/bottom slabs).  Avoids materializing the padded copy of every
    residual/decoder activation (e.g. 33 MB per AdaAttN decoder conv at
    512p).
    """
    n, h, ww_, cin = x.shape
    assert w.shape[0] == 3 and h >= 3 and ww_ >= 3

    def cv(inp):
        return lax.conv_general_dilated(
            inp, w, (1, 1), "VALID", dimension_numbers=_DIMNUMS,
            preferred_element_type=conv_accum_dtype(x.dtype),
            precision=matmul_precision(x.dtype),
        )

    main = cv(x)                                        # out[1:-1, 1:-1]

    def wpad(slab):  # reflect cols -1 and W
        return jnp.concatenate(
            [slab[:, :, 1:2], slab, slab[:, :, -2:-1]], axis=2)

    top = cv(wpad(jnp.concatenate([x[:, 1:2], x[:, 0:2]], axis=1)))
    bottom = cv(wpad(jnp.concatenate([x[:, -2:], x[:, -2:-1]], axis=1)))
    left = cv(jnp.concatenate([x[:, :, 1:2], x[:, :, 0:2]], axis=2))
    right = cv(jnp.concatenate([x[:, :, -2:], x[:, :, -2:-1]], axis=2))

    mid = jnp.concatenate([left, main, right], axis=2)
    out = jnp.concatenate([top, mid, bottom], axis=1)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def max_pool2d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """Max pooling (VALID), matching ``torch.nn.MaxPool2d(window, stride)``."""
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
