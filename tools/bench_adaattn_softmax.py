"""Block-shape sweep for the AdaAttN softmax flash-moments kernel.

VERDICT r3 item 5: the 512² softmax serving path is the slowest in the
suite (90 fps) and its (bq, bk) default came from a single-point sweep.
This sweeps (bq, bk) blocks at the attention-level shapes of 512² serving
(AdaAttN/network.py:223-251: relu3_1/4_1/5_1 with multi-scale Q/K) and
prints the best per level; confirm end-to-end with
``bench.py --path adaattn-softmax-512`` after updating the kernel default.

    python tools/bench_adaattn_softmax.py [--batch 2] [--levels relu3_1 ...]
"""
import argparse
import functools
import itertools
import time

import numpy as np


# (tokens_n==tokens_m, qk_dim, v_dim) per attention level at 512² serving
LEVEL_SHAPES = {
    "relu3_1": (128 * 128, 448, 256),
    "relu4_1": (64 * 64, 960, 512),
    "relu5_1": (32 * 32, 1472, 512),
}


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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--levels", nargs="*", default=["relu3_1"])
    p.add_argument("--blocks", nargs="*", type=int,
                   default=[256, 512, 1024, 2048])
    p.add_argument("--exp2", action="store_true",
                   help="base-2-domain softmax (kernel exp2=True)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vst_tpu.kernels.adaattn_attention import (
        softmax_attention_moments_pallas)

    rng = np.random.default_rng(0)
    b = args.batch

    for level in args.levels:
        n, d, c = LEVEL_SHAPES[level]
        q = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32),
                        dtype=jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32),
                        dtype=jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32),
                        dtype=jnp.bfloat16)
        print(f"--- {level}: b{b} n=m={n} d={d} c={c}", flush=True)
        results = {}
        for bq, bk in itertools.product(args.blocks, args.blocks):
            if bq > n or bk > n:
                continue

            @functools.partial(jax.jit, static_argnums=(3,))
            def run(q, k, v, nst, bq=bq, bk=bk):
                def body(acc, i):
                    m1, m2 = softmax_attention_moments_pallas(
                        q + i.astype(q.dtype), k, v, bq=bq, bk=bk,
                        exp2=args.exp2)
                    return acc + jnp.mean(m1.astype(jnp.float32)) \
                        + jnp.mean(m2.astype(jnp.float32)), None

                a, _ = jax.lax.scan(body, jnp.float32(0.0),
                                    jnp.arange(nst, dtype=jnp.int32))
                return a

            try:
                dt = secs_per_iter(functools.partial(run, q, k, v))
            except Exception as e:
                print(f"  bq={bq:5d} bk={bk:5d}: FAILED "
                      f"({type(e).__name__}: {str(e)[:80]})", flush=True)
                continue
            results[(bq, bk)] = dt
            print(f"  bq={bq:5d} bk={bk:5d}: {dt * 1e3:7.2f} ms/call",
                  flush=True)
        if results:
            best = min(results, key=results.get)
            print(f"  BEST {level}: bq={best[0]} bk={best[1]} "
                  f"({results[best] * 1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
