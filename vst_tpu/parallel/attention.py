"""Sequence-parallel AdaAttN cosine attention.

The closed linear form of cos+1 row-normalized attention
(vst_tpu.models.adaattn) depends on the keys/values ONLY through global
moments (Σk̂, K̂ᵀV, K̂ᵀV², ΣV, ΣV², m).  Sharding the hw token axis across
chips therefore costs exactly one psum of those small (d·c-sized) moments —
queries never move, and the output stays token-sharded.  This is the
long-context strategy for high-resolution arbitrary-style inference
(SURVEY.md §5.7): O(d·c) bytes over ICI per frame instead of any
all-gather of features.
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
