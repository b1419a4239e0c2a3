"""Bottleneck attribution for the AdaAttN flash-moments forward kernel.

The 512² relu3_1 softmax serving shape (b2, n=m=16384, d=448, c=256) has a
~1 TFLOP dot load → ~8 ms roofline at the v5e's ~130 T-ops/s bf16, yet the
kernel measures ~34 ms (BENCH.md).  This times four local variants of the
forward kernel that differ in ONE ingredient each, so the gap can be
attributed before optimizing:

  exp        — the production formulation (f32-cast operands, jnp.exp)
  exp2       — base-2-domain softmax (pow2 in place of exp)
  noexp      — control: softmax replaced by a 0.5+s*1e-6 linear map (wrong
               numbers, same dots/traffic) → isolates the VPU exp cost
  bf16dots   — operands fed to the MXU in bf16 (f32 accumulate via
               preferred_element_type), exp kept → isolates the f32-cast
               cost

    python tools/profile_softmax_kernel.py [--batch 2] [--bq 1024] [--bk 512]
"""
import argparse
import functools
import time

import numpy as np

LOG2E = 1.4426950408889634


def secs_per_iter(run, short=4, long=16, reps=3):
    def timed(n):
        float(run(n))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(long) - timed(short)) / (long - short)


def make_kernel(jnp, jax, pl, *, nk, bk, m_actual, variant):
    def dot(a, b, trans_b=False):
        return jax.lax.dot_general(
            a, b, (((1,), (1,) if trans_b else (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def kernel(q_ref, k_ref, v_ref, o1_ref, o2_ref,
               mi_ref, li_ref, a1_ref, a2_ref):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            mi_ref[:] = jnp.full_like(mi_ref, -1e30)
            li_ref[:] = jnp.zeros_like(li_ref)
            a1_ref[:] = jnp.zeros_like(a1_ref)
            a2_ref[:] = jnp.zeros_like(a2_ref)

        if variant == "bf16dots":
            q = q_ref[0]
            k = k_ref[0]
            v32 = v_ref[0].astype(jnp.float32)
        else:
            q = q_ref[0].astype(jnp.float32)
            k = k_ref[0].astype(jnp.float32)
            v32 = v_ref[0].astype(jnp.float32)
        if variant == "exp2":
            q = q * LOG2E

        s = dot(q, k, trans_b=True)
        key_idx = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_idx < m_actual, s, -1e30)

        m_prev = mi_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        if variant == "noexp":
            p = 0.5 + (s - m_new) * 1e-6
            alpha = jnp.ones_like(m_prev)
        elif variant == "exp2":
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_prev - m_new)
        else:
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)

        if variant == "bf16dots":
            pd = p.astype(jnp.bfloat16)
            v = v_ref[0]
        else:
            pd = p
            v = v32
        li_ref[:] = li_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        a1_ref[:] = a1_ref[:] * alpha + dot(pd, v)
        a2_ref[:] = a2_ref[:] * alpha + dot(pd, (v32 * v32).astype(v.dtype))
        mi_ref[:] = m_new

        @pl.when(j == nk - 1)
        def _():
            inv = 1.0 / li_ref[:]
            o1_ref[0] = (a1_ref[:] * inv).astype(o1_ref.dtype)
            o2_ref[0] = (a2_ref[:] * inv).astype(o2_ref.dtype)

    return kernel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--bq", type=int, default=1024)
    p.add_argument("--bk", type=int, default=512)
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--d", type=int, default=448)
    p.add_argument("--c", type=int, default=256)
    p.add_argument("--variants", nargs="*",
                   default=["exp", "exp2", "noexp", "bf16dots"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    b, n, d, c = args.batch, args.n, args.d, args.c
    bq, bk = args.bq, args.bk
    nq, nk = n // bq, n // bk
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, n, d)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, d)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, c)), dtype=jnp.bfloat16)

    flops = b * (2 * n * n * d + 4 * n * n * c)
    print(f"shape b{b} n=m={n} d={d} c={c} blocks ({bq},{bk}); "
          f"{flops / 1e9:.0f} GFLOP/call", flush=True)

    for variant in args.variants:
        kern = make_kernel(jnp, jax, pl, nk=nk, bk=bk, m_actual=n,
                           variant=variant)
        call = pl.pallas_call(
            kern,
            grid=(b, nq, nk),
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
            out_shape=[
                jax.ShapeDtypeStruct((b, n, c), q.dtype),
                jax.ShapeDtypeStruct((b, n, c), q.dtype),
            ],
        )

        @functools.partial(jax.jit, static_argnums=(3,))
        def run(q, k, v, nst, call=call):
            def body(acc, i):
                m1, m2 = call(q + i.astype(q.dtype), k, v)
                return acc + jnp.mean(m1.astype(jnp.float32)) \
                    + jnp.mean(m2.astype(jnp.float32)), None

            a, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(nst, dtype=jnp.int32))
            return a

        try:
            dt = secs_per_iter(functools.partial(run, q, k, v))
        except Exception as e:
            print(f"  {variant:9s}: FAILED "
                  f"({type(e).__name__}: {str(e)[:100]})", flush=True)
            continue
        print(f"  {variant:9s}: {dt * 1e3:7.2f} ms/call "
              f"({flops / dt / 1e12:5.1f} T-ops/s)", flush=True)


if __name__ == "__main__":
    main()


