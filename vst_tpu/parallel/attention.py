"""Sequence-parallel AdaAttN attention (cosine + softmax).

Cosine: the closed linear form of cos+1 row-normalized attention
(vst_tpu.models.adaattn) depends on the keys/values ONLY through global
moments (Σk̂, K̂ᵀV, K̂ᵀV², ΣV, ΣV², m).  Sharding the hw token axis across
chips therefore costs exactly one psum of those small (d·c-sized) moments —
queries never move, and the output stays token-sharded.

Softmax has no such linear form (every query row needs every key), so it
runs as **ring attention**: K/V shards rotate around the mesh via
``ppermute`` while each chip folds one block at a time into an online
softmax (running row-max, denominator, and the A·V / A·V² numerators).
The (n, m) score matrix never exists beyond one (n/D, m/D) block, and the
wire cost is O(m·(d+c)/D) bytes per hop over ICI.

Together these are the long-context strategy for high-resolution
arbitrary-style inference (SURVEY.md §5.7): token counts grow with
resolution as h·w, and both paths keep per-chip memory and ICI traffic at
1/D of the single-device working set.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.5 exposes shard_map at the top level; the experimental
    from jax import shard_map  # path is deprecated (removed after 0.8)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from vst_tpu.ops._precision import matmul_precision


def sharded_cosine_attention_moments(mesh: Mesh, q, k, v, axis: str = "data"):
    """q: (b, n, d), k: (b, m, d), v: (b, m, c), all sharded on dim 1 over
    ``axis``.  Returns (M1, M2) token-sharded like q.  Matches the
    single-device linear form bit-near."""
    prec = matmul_precision(q.dtype)

    def local(q, k, v):
        m_total = k.shape[1] * jax.lax.psum(1, axis)
        qn = q * jax.lax.rsqrt(jnp.sum(jnp.square(q), axis=-1, keepdims=True))
        kn = k * jax.lax.rsqrt(jnp.sum(jnp.square(k), axis=-1, keepdims=True))
        ksum = jax.lax.psum(jnp.sum(kn, axis=1), axis)
        vsum = jax.lax.psum(jnp.sum(v, axis=1), axis)
        v2sum = jax.lax.psum(jnp.sum(v * v, axis=1), axis)
        kv = jax.lax.psum(
            jnp.einsum("bmd,bmc->bdc", kn, v,
                       preferred_element_type=jnp.float32, precision=prec),
            axis)
        kv2 = jax.lax.psum(
            jnp.einsum("bmd,bmc->bdc", kn, v * v,
                       preferred_element_type=jnp.float32, precision=prec),
            axis)
        row = jnp.einsum("bnd,bd->bn", qn, ksum,
                         preferred_element_type=jnp.float32,
                         precision=prec) + m_total
        inv = (1.0 / row)[..., None]
        m1 = (jnp.einsum("bnd,bdc->bnc", qn, kv,
                         preferred_element_type=jnp.float32, precision=prec)
              + vsum[:, None, :]) * inv
        m2 = (jnp.einsum("bnd,bdc->bnc", qn, kv2,
                         preferred_element_type=jnp.float32, precision=prec)
              + v2sum[:, None, :]) * inv
        return m1.astype(q.dtype), m2.astype(q.dtype)

    spec = P(None, axis, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=(spec, spec))
    return fn(q, k, v)


def sharded_softmax_attention_moments(mesh: Mesh, q, k, v,
                                      axis: str = "data"):
    """Ring-attention softmax moments: M1 = softmax(QKᵀ)V, M2 = softmax·V².

    q: (b, n, d), k: (b, m, d), v: (b, m, c), all sharded on dim 1 over
    ``axis``.  Returns (M1, M2) token-sharded like q, f32 accumulation.

    Each chip keeps its query shard resident and folds one rotating K/V
    block per step into an online softmax (flash-style running max +
    rescaled accumulators), then ``ppermute``s the block to its neighbour.
    After D = mesh.shape[axis] steps every block has visited every chip.
    The ring is unrolled (D is static), so this targets single-digit-to-
    tens-of-chips meshes — the AdaAttN serving regime.  Matches the
    single-device exact softmax moments (AdaAttN/network.py:102-108 + the
    A·V/A·V² moments of network.py:191-220) to f32 tolerance; softmax is
    permutation-invariant over keys, so block visit order is immaterial.
    """
    prec = matmul_precision(q.dtype)
    n_dev = mesh.shape[axis]
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    def local(q, k, v):
        b, n, _ = q.shape
        c = v.shape[-1]
        qf = q.astype(jnp.float32)
        mx = jnp.full((b, n, 1), -jnp.inf, jnp.float32)
        s = jnp.zeros((b, n, 1), jnp.float32)
        n1 = jnp.zeros((b, n, c), jnp.float32)
        n2 = jnp.zeros((b, n, c), jnp.float32)
        kb, vb = k, v
        for step in range(n_dev):
            scores = jnp.einsum("bnd,bmd->bnm", qf, kb.astype(jnp.float32),
                                preferred_element_type=jnp.float32,
                                precision=prec)
            bmax = jnp.max(scores, axis=-1, keepdims=True)
            new_mx = jnp.maximum(mx, bmax)
            alpha = jnp.exp(mx - new_mx)
            p = jnp.exp(scores - new_mx)
            vf = vb.astype(jnp.float32)
            s = s * alpha + jnp.sum(p, axis=-1, keepdims=True)
            n1 = n1 * alpha + jnp.einsum(
                "bnm,bmc->bnc", p, vf,
                preferred_element_type=jnp.float32, precision=prec)
            n2 = n2 * alpha + jnp.einsum(
                "bnm,bmc->bnc", p, vf * vf,
                preferred_element_type=jnp.float32, precision=prec)
            mx = new_mx
            if step != n_dev - 1:
                kb = jax.lax.ppermute(kb, axis, perm)
                vb = jax.lax.ppermute(vb, axis, perm)
        inv = 1.0 / s
        return (n1 * inv).astype(q.dtype), (n2 * inv).astype(q.dtype)

    spec = P(None, axis, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=(spec, spec))
    return fn(q, k, v)
