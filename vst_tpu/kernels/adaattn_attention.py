"""Fused AdaAttN softmax-attention moments — Pallas TPU kernels with a
custom VJP.

Forward: M1 = softmax(QKᵀ)·V and M2 = softmax(QKᵀ)·V² in one blockwise pass
(flash-attention online softmax extended with a second value accumulator),
never materializing the (n×m) attention map.  The per-row logsumexp L is
kept as the backward residual.

Backward (flash-style, also map-free): with A = exp(S − L),
    dA  = dM1·Vᵀ + dM2·Wᵀ           (W = V∘V)
    D_i = dM1_i·M1_i + dM2_i·M2_i    (the softmax row-correction term,
                                      since Σ_j A_ij dA_ij = that dot)
    dS  = A ∘ (dA − D)
    dQ  = dS·K      dK = dSᵀ·Q      dV = Aᵀ·dM1 + 2V∘(Aᵀ·dM2)
computed in two grids (k-innermost for dQ, q-innermost for dK/dV) with VMEM
accumulators.  This makes high-resolution softmax-attention TRAINING memory
safe: the chunked XLA path's autodiff residuals still materialize all n×m
scores, this kernel never does.

This is the memory-bound hot op of the AdaAttN image model at video
resolutions (SURVEY.md §7 hard part 4).  The cosine path needs no kernel —
it collapses to linear form (vst_tpu.models.adaattn).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vst_tpu.ops._precision import matmul_precision

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # log2(e): exp(x) == exp2(x * LOG2E)


def _dot(a, b, precision, trans_a=False, trans_b=False):
    dims = ((0,) if trans_a else (1,), (0,) if not trans_b else (1,))
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)


# ----------------------------------------------------------------- forward

def _fwd_kernel(q_ref, k_ref, v_ref, o1_ref, o2_ref, lse_ref,
                mi_ref, li_ref, a1_ref, a2_ref, *, nk, m_actual, bk,
                precision, exp2):
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

    if exp2:
        # base-2 domain: exp(s) == exp2(s·log2e); fold the scale into the
        # f32 q block (bq·d mults) so the (bq·bk) score grid pays only the
        # cheaper pow2 VPU op.  mi/li/lse then live in the base-2 domain.
        q = q * LOG2E
    e = jnp.exp2 if exp2 else jnp.exp
    s = _dot(q, k, precision, trans_b=True)              # (bq, bk)
    key_idx = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < m_actual, s, NEG_INF)

    m_prev = mi_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = e(s - m_new)
    alpha = e(m_prev - m_new)

    li_ref[:] = li_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    a1_ref[:] = a1_ref[:] * alpha + _dot(p, v, precision)
    a2_ref[:] = a2_ref[:] * alpha + _dot(p, v * v, precision)
    mi_ref[:] = m_new

    @pl.when(j == nk - 1)
    def _():
        inv = 1.0 / li_ref[:]
        o1_ref[0] = (a1_ref[:] * inv).astype(o1_ref.dtype)
        o2_ref[0] = (a2_ref[:] * inv).astype(o2_ref.dtype)
        log = jnp.log2 if exp2 else jnp.log
        lse_ref[0] = mi_ref[:] + log(li_ref[:])


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _forward(q, k, v, bq, bk, interpret, exp2):
    b, n, d = q.shape
    m = k.shape[1]
    c = v.shape[2]
    qp = _pad_to(q, 1, bq)
    kp = _pad_to(k, 1, bk)
    vp = _pad_to(v, 1, bk)
    nq = qp.shape[1] // bq
    nk = kp.shape[1] // bk

    kernel = functools.partial(_fwd_kernel, nk=nk, m_actual=m, bk=bk,
                               precision=matmul_precision(q.dtype),
                               exp2=exp2)
    o1, o2, lse = pl.pallas_call(
        kernel,
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, bk, c), lambda bi, qi, ki: (bi, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, bq, c), lambda bi, qi, ki: (bi, qi, 0)),
            # row vectors are (b, n, 1): a (1, bq) block over (b, n) only
            # lowers on TPU when b == 1 (block dim -2 must be divisible by
            # 8 or equal the array dim); the trailing singleton makes the
            # block (1, bq, 1) legal for any batch
            pl.BlockSpec((1, bq, 1), lambda bi, qi, ki: (bi, qi, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.VMEM((bq, c), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, qp.shape[1], c), q.dtype),
            jax.ShapeDtypeStruct((b, qp.shape[1], c), q.dtype),
            jax.ShapeDtypeStruct((b, qp.shape[1], 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return o1, o2, lse


# ---------------------------------------------------------------- backward

def _bwd_dq_kernel(q_ref, k_ref, v_ref, dm1_ref, dm2_ref, lse_ref, dd_ref,
                   dq_ref, acc_ref, *, nk, m_actual, bk, precision, exp2):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    dm1 = dm1_ref[0].astype(jnp.float32)
    dm2 = dm2_ref[0].astype(jnp.float32)
    lse = lse_ref[0]          # (bq, 1); base-2 domain when exp2
    dd = dd_ref[0]            # (bq, 1)

    qs = q * LOG2E if exp2 else q
    s = _dot(qs, k, precision, trans_b=True)
    key_idx = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < m_actual, s, NEG_INF)
    a = jnp.exp2(s - lse) if exp2 else jnp.exp(s - lse)
    da = _dot(dm1, v, precision, trans_b=True) \
        + _dot(dm2, v * v, precision, trans_b=True)
    ds = a * (da - dd)
    acc_ref[:] = acc_ref[:] + _dot(ds, k, precision)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, dm1_ref, dm2_ref, lse_ref, dd_ref,
                    dk_ref, dv_ref, dk_acc, dv1_acc, dv2_acc,
                    *, nq, m_actual, bk, precision, exp2):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv1_acc[:] = jnp.zeros_like(dv1_acc)
        dv2_acc[:] = jnp.zeros_like(dv2_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    dm1 = dm1_ref[0].astype(jnp.float32)
    dm2 = dm2_ref[0].astype(jnp.float32)
    lse = lse_ref[0]          # (bq, 1); base-2 domain when exp2
    dd = dd_ref[0]            # (bq, 1)

    kj = pl.program_id(1)
    qs = q * LOG2E if exp2 else q
    s = _dot(qs, k, precision, trans_b=True)             # (bq, bk)
    key_idx = kj * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < m_actual, s, NEG_INF)
    a = jnp.exp2(s - lse) if exp2 else jnp.exp(s - lse)
    da = _dot(dm1, v, precision, trans_b=True) \
        + _dot(dm2, v * v, precision, trans_b=True)
    ds = a * (da - dd)

    dk_acc[:] = dk_acc[:] + _dot(ds, q, precision, trans_a=True)
    dv1_acc[:] = dv1_acc[:] + _dot(a, dm1, precision, trans_a=True)
    dv2_acc[:] = dv2_acc[:] + _dot(a, dm2, precision, trans_a=True)

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = (dv1_acc[:] + 2.0 * v * dv2_acc[:]).astype(dv_ref.dtype)


def _backward(res, grads, bq, bk, interpret, exp2):
    q, k, v, o1, o2, lse = res
    dm1, dm2 = grads
    b, n, d = q.shape
    m = k.shape[1]
    c = v.shape[2]
    prec = matmul_precision(q.dtype)
    # the backward kernels carry more per-block state (f32 dq/dk/dv
    # accumulators + the dM1/dM2 cotangent blocks); the forward's tall
    # bq=1024 block overflows the 16 MB VMEM scoped limit by ~0.4 MB at
    # the 512p relu3_1 shape, so cap the q block here independently
    bq = min(bq, 512)

    # softmax row correction D_i = dM1_i·M1_i + dM2_i·M2_i
    dd = (jnp.sum(dm1.astype(jnp.float32) * o1.astype(jnp.float32),
                  axis=-1, keepdims=True)
          + jnp.sum(dm2.astype(jnp.float32) * o2.astype(jnp.float32),
                    axis=-1, keepdims=True))

    qp = _pad_to(q, 1, bq)
    kp = _pad_to(k, 1, bk)
    vp = _pad_to(v, 1, bk)
    dm1p = _pad_to(dm1.astype(q.dtype), 1, bq)
    dm2p = _pad_to(dm2.astype(q.dtype), 1, bq)
    lsep = _pad_to(lse, 1, bq)
    ddp = _pad_to(dd, 1, bq)
    nq = qp.shape[1] // bq
    nk = kp.shape[1] // bk

    q_spec_q = pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0))
    k_spec_q = pl.BlockSpec((1, bk, d), lambda bi, qi, ki: (bi, ki, 0))
    v_spec_q = pl.BlockSpec((1, bk, c), lambda bi, qi, ki: (bi, ki, 0))
    dm_spec_q = pl.BlockSpec((1, bq, c), lambda bi, qi, ki: (bi, qi, 0))
    row_spec_q = pl.BlockSpec((1, bq, 1), lambda bi, qi, ki: (bi, qi, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, nk=nk, m_actual=m, bk=bk,
                          precision=prec, exp2=exp2),
        grid=(b, nq, nk),
        in_specs=[q_spec_q, k_spec_q, v_spec_q, dm_spec_q, dm_spec_q,
                  row_spec_q, row_spec_q],
        out_specs=pl.BlockSpec((1, bq, d), lambda bi, qi, ki: (bi, qi, 0)),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((b, qp.shape[1], d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, dm1p, dm2p, lsep, ddp)

    # q-innermost grid for dK/dV
    q_spec_k = pl.BlockSpec((1, bq, d), lambda bi, ki, qi: (bi, qi, 0))
    k_spec_k = pl.BlockSpec((1, bk, d), lambda bi, ki, qi: (bi, ki, 0))
    v_spec_k = pl.BlockSpec((1, bk, c), lambda bi, ki, qi: (bi, ki, 0))
    dm_spec_k = pl.BlockSpec((1, bq, c), lambda bi, ki, qi: (bi, qi, 0))
    row_spec_k = pl.BlockSpec((1, bq, 1), lambda bi, ki, qi: (bi, qi, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, nq=nq, m_actual=m, bk=bk,
                          precision=prec, exp2=exp2),
        grid=(b, nk, nq),
        in_specs=[q_spec_k, k_spec_k, v_spec_k, dm_spec_k, dm_spec_k,
                  row_spec_k, row_spec_k],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda bi, ki, qi: (bi, ki, 0)),
            pl.BlockSpec((1, bk, c), lambda bi, ki, qi: (bi, ki, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, c), jnp.float32),
            pltpu.VMEM((bk, c), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, kp.shape[1], d), q.dtype),
            jax.ShapeDtypeStruct((b, kp.shape[1], c), v.dtype),
        ],
        interpret=interpret,
    )(qp, kp, vp, dm1p, dm2p, lsep, ddp)

    return dq[:, :n], dk[:, :m], dv[:, :m]


# ------------------------------------------------------------- public API

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _moments(q, k, v, bq, bk, interpret, exp2):
    o1, o2, _ = _forward(q, k, v, bq, bk, interpret, exp2)
    n = q.shape[1]
    return o1[:, :n], o2[:, :n]


def _moments_fwd(q, k, v, bq, bk, interpret, exp2):
    o1, o2, lse = _forward(q, k, v, bq, bk, interpret, exp2)
    n = q.shape[1]
    out = (o1[:, :n], o2[:, :n])
    return out, (q, k, v, out[0], out[1], lse[:, :n])


def _moments_bwd(bq, bk, interpret, exp2, res, grads):
    return _backward(res, grads, bq, bk, interpret, exp2)


_moments.defvjp(_moments_fwd, _moments_bwd)


@functools.partial(jax.jit,
                   static_argnames=("bq", "bk", "interpret", "exp2"))
def softmax_attention_moments_pallas(q, k, v, bq: int = 1024, bk: int = 512,
                                     interpret: bool = False,
                                     exp2: bool = False):
    """q: (b, n, d), k: (b, m, d), v: (b, m, c) → (M1, M2) each (b, n, c).

    Matches ``_attention_moments_softmax_exact`` numerics to fp32 rounding;
    differentiable via the flash-style custom VJP above.

    Default blocks from an on-chip sweep at the 512² relu3_1 shape
    (b2, n=m=16384, d=448, c=256): (1024, 512) ran 34.1 ms vs 37.2 ms for
    the previous (256, 512); tall q blocks amortize the k/v reload.

    ``exp2=True`` evaluates the softmax in the base-2 domain (scores scaled
    by log2(e) via the q block, ``exp2``/``log2`` in place of ``exp``/
    ``log``) — a candidate win when the kernel is VPU-exp-bound; numerics
    agree to f32 rounding (the scale is folded in f32, not into the bf16
    inputs).
    """
    return _moments(q, k, v, bq, bk, interpret, exp2)
