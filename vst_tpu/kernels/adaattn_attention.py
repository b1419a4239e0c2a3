"""Fused AdaAttN softmax-attention moments — Pallas TPU kernel.

Computes M1 = softmax(QKᵀ)·V and M2 = softmax(QKᵀ)·V² in one blockwise
pass (flash-attention online-softmax scheme extended with a second value
accumulator), never materializing the (n×m) attention map.

This is the memory-bound hot op of the AdaAttN image model at video
resolutions (SURVEY.md §7 hard part 4: an 8192² fp32 map would be 256 MB
per level-1 head).  The cosine-activation path doesn't need a kernel at all
— it collapses to linear form (vst_tpu.models.adaattn).

Grid: (batch, q-blocks, k-blocks), k innermost — TPU grid order is
sequential, so the running max / sum / moment accumulators live in VMEM
scratch across the k iteration.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o1_ref, o2_ref,
            mi_ref, li_ref, a1_ref, a2_ref, *, nk: int, m_actual: int,
            bk: int, precision):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        mi_ref[:] = jnp.full_like(mi_ref, NEG_INF)
        li_ref[:] = jnp.zeros_like(li_ref)
        a1_ref[:] = jnp.zeros_like(a1_ref)
        a2_ref[:] = jnp.zeros_like(a2_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                             # (bq, bk)

    # mask padded keys in the last block
    key_idx = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < m_actual, s, NEG_INF)

    m_prev = mi_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)                               # (bq, bk)
    alpha = jnp.exp(m_prev - m_new)                      # (bq, 1)

    li_ref[:] = li_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=precision)
    pv2 = jax.lax.dot_general(p, v * v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=precision)
    a1_ref[:] = a1_ref[:] * alpha + pv
    a2_ref[:] = a2_ref[:] * alpha + pv2
    mi_ref[:] = m_new

    @pl.when(j == nk - 1)
    def _():
        inv = 1.0 / li_ref[:]
        o1_ref[0] = (a1_ref[:] * inv).astype(o1_ref.dtype)
        o2_ref[0] = (a2_ref[:] * inv).astype(o2_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "interpret"))
def softmax_attention_moments_pallas(q, k, v, bq: int = 256, bk: int = 512,
                                     interpret: bool = False):
    """q: (b, n, d), k: (b, m, d), v: (b, m, c) → (M1, M2) each (b, n, c).

    Matches ``_attention_moments_softmax_exact`` numerics to fp32 rounding.
    """
    b, n, d = q.shape
    m = k.shape[1]
    c = v.shape[2]
    qp = _pad_to(q, 1, bq)
    kp = _pad_to(k, 1, bk)
    vp = _pad_to(v, 1, bk)
    nq = qp.shape[1] // bq
    nk = kp.shape[1] // bk

    grid = (b, nq, nk)
    out_shape = [
        jax.ShapeDtypeStruct((b, qp.shape[1], c), q.dtype),
        jax.ShapeDtypeStruct((b, qp.shape[1], c), q.dtype),
    ]
    from vst_tpu.ops._precision import matmul_precision

    kernel = functools.partial(_kernel, nk=nk, m_actual=m, bk=bk,
                               precision=matmul_precision(q.dtype))
    o1, o2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, bk, c), lambda bi, qi, ki: (bi, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, bq, c), lambda bi, qi, ki: (bi, qi, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.VMEM((bq, c), jnp.float32),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(qp, kp, vp)
    return o1[:, :n], o2[:, :n]
