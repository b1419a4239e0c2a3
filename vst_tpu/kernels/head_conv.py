"""Pallas kernel for the polyphase-packed ReCoNet ConvTanh head.

The 9×9 48→3 head (ReCoNet/network.py:78-85) is the slowest stage of the
512p inference profile (BENCH.md): with 3 output channels it can use only
3/128 MXU lanes, and even the f=4 polyphase repack (ops/conv.py:93-151,
which turns it into a 3×3 conv over 768→48 packed channels) measures
~9 TFLOP/s — far under the ~74 TFLOP/s the 48/128-lane ceiling allows.

This kernel evaluates that packed 3×3 VALID conv directly: the grid walks
(batch, row-blocks); each instance holds three row-shifted input slabs in
VMEM and accumulates nine (bh·W, C)×(C, Co) MXU matmuls in f32.  The
row-shifted slabs are materialized by XLA slices (three reads of the
input instead of halo-overlapping block specs — ~0.1 ms of extra HBM
traffic at 512², amortized against the matmul win).

NOT wired into the serving path: measured 2.2x slower than XLA's conv on
the isolated packed head conv (BENCH.md negative results), so
ops.conv.conv2d_polyphase always takes the XLA path.  Kept in-tree as the
measured-slower engineering record, exercised only by tests/test_kernels.py
and the tools/ benches.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vst_tpu.ops._precision import matmul_precision


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, o_ref, *, wo, precision):
    rows = (x0_ref[0], x1_ref[0], x2_ref[0])
    w = w_ref[...].astype(jnp.float32)          # (3, 3, C, Co)
    acc = None
    for dy in range(3):
        xi = rows[dy].astype(jnp.float32)        # (bh, Wp, C)
        for dx in range(3):
            lhs = xi[:, dx:dx + wo, :]           # (bh, Wo, C)
            part = jax.lax.dot_general(
                lhs, w[dy, dx], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            acc = part if acc is None else acc + part
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def conv3x3_valid_pallas(x, w, bh: int = 8, interpret: bool = False):
    """3×3 VALID convolution, NHWC × HWIO → NHWC.

    x: (N, Ho+2, Wo+2, C); w: (3, 3, C, Co).  Requires Ho % bh == 0.
    f32 accumulation, output in x.dtype.
    """
    n, hp, wp, c = x.shape
    ho, wo = hp - 2, wp - 2
    co = w.shape[3]
    assert ho % bh == 0, (ho, bh)
    x0 = x[:, 0:ho]
    x1 = x[:, 1:ho + 1]
    x2 = x[:, 2:hp]

    in_spec = pl.BlockSpec((1, bh, wp, c), lambda b, i: (b, i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, wo=wo, precision=matmul_precision(x.dtype)),
        grid=(n, ho // bh),
        in_specs=[in_spec, in_spec, in_spec,
                  pl.BlockSpec((3, 3, c, co), lambda b, i: (0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, bh, wo, co), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, co), x.dtype),
        interpret=interpret,
    )(x0, x1, x2, w)
    return out
