"""In-model A/B: split-border vs DUS-border reflect conv for ReCoNet conv2.

Round-3 stage profile: conv2's reflect-border handling costs 0.23 of its
0.56 ms/frame (a plain zero-pad conv in place measures 0.33) — the two
output concats sit between the conv and its IN+relu consumers.  The DUS
formulation (ops/conv.py::conv2d_reflect1_k3s2_dus, bit-equal) writes the
border ring with dynamic-update-slice over one dense asymmetric-zero-pad
conv instead.  This measures the FULL 512² b8 bf16 headline chain both
ways (chain-difference methodology, bench.py).

    python tools/bench_conv2_dus.py [--batch 8] [--family reconet]
"""
import argparse
import functools
import time

import numpy as np


def chain_fps(run, batch, short=8, long=40, reps=3):
    def timed(n):
        float(run(n))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(n))
            best = min(best, time.perf_counter() - t0)
        return best

    ts, tl = timed(short), timed(long)
    return (long - short) * batch / max(tl - ts, 1e-9)


def headline(family, batch, size, short, long_):
    import jax
    import jax.numpy as jnp

    from vst_tpu.models import reconet

    init = {"reconet": reconet.init_reconet, "sd1": reconet.init_reconet_sd1,
            "sd2": reconet.init_reconet_sd2}[family]
    fwd = {"reconet": reconet.reconet, "sd1": reconet.reconet_sd1,
           "sd2": reconet.reconet_sd2}[family]
    params = jax.tree.map(lambda v: jnp.asarray(v, jnp.bfloat16), init(0))

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(params, x, n):
        def body(carry, i):
            out = jnp.clip(fwd(params, x + i.astype(jnp.bfloat16))[-1],
                           0, 255)
            return jnp.mean(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(n, dtype=jnp.int32))
        return acc

    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((batch, size, size, 3)) * 255)
                    .astype(np.float32), jnp.bfloat16)
    return chain_fps(lambda n: run(params, x, n), batch,
                     short=short, long=long_)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--family", default="reconet",
                   choices=["reconet", "sd1", "sd2"])
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--short", type=int, default=8)
    p.add_argument("--long", dest="long_", type=int, default=40)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vst_tpu.models import reconet as rmod
    from vst_tpu.ops import conv as cmod

    stock = headline(args.family, args.batch, args.size,
                     args.short, args.long_)
    print(f"split-border (stock): {stock:.1f} fps", flush=True)

    rmod.conv2d_reflect1_k3s2 = cmod.conv2d_reflect1_k3s2_dus
    try:
        dus = headline(args.family, args.batch, args.size,
                       args.short, args.long_)
    finally:
        rmod.conv2d_reflect1_k3s2 = cmod.conv2d_reflect1_k3s2
    print(f"dus-border: {dus:.1f} fps ({dus / stock:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
