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
from jax import lax

from vst_tpu.ops._precision import matmul_precision

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
        preferred_element_type=jnp.float32,
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
        preferred_element_type=jnp.float32,
        precision=matmul_precision(x.dtype),
    )
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
