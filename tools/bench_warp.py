"""Grid-sample formulation micro-benchmark (BENCH.md "corner-packed" rows).

Compares the corner-packed single gather against the four per-corner
gathers, forward and backward, at image and feature shapes — the
measurement behind ops/warp.py's ``_PACK_MAX_CHANNELS`` gate.

    python tools/bench_warp.py
"""
import functools
import importlib
import time

import numpy as np


def secs_per_iter(run, short=4, long=16, reps=4):
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
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    W = importlib.import_module("vst_tpu.ops.warp")

    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    def run_shape(n, h, w, c, grad):
        x = jnp.asarray(rng.standard_normal((n, h, w, c))
                        .astype(np.float32)).astype(jnp.bfloat16)
        flow = jnp.asarray((rng.standard_normal((n, h, w, 2)) * 5)
                           .astype(np.float32))
        results = {}
        for name, cap in (("packed", 10 ** 9), ("per-corner", -1)):
            W._PACK_MAX_CHANNELS = cap
            if grad:
                loss = lambda x, fl: jnp.sum(
                    jnp.square(W.warp(x, fl).astype(jnp.float32)))
                g = jax.grad(loss, argnums=(0, 1))

                @functools.partial(jax.jit, static_argnums=(2,))
                def run(x, flow, nst):
                    def body(acc, i):
                        gx, gf = g(x, flow + i.astype(jnp.float32) * 1e-3)
                        return acc + jnp.sum(gx.astype(jnp.float32)) \
                            + jnp.sum(gf), None
                    a, _ = jax.lax.scan(body, jnp.float32(0.0),
                                        jnp.arange(nst, dtype=jnp.int32))
                    return a
            else:
                @functools.partial(jax.jit, static_argnums=(2,))
                def run(x, flow, nst):
                    def body(acc, i):
                        fl = flow + i.astype(jnp.float32) * 1e-3
                        return acc + jnp.mean(
                            W.warp(x, fl).astype(jnp.float32)), None
                    a, _ = jax.lax.scan(body, jnp.float32(0.0),
                                        jnp.arange(nst, dtype=jnp.int32))
                    return a
            results[name] = secs_per_iter(
                functools.partial(run, x, flow))
        W._PACK_MAX_CHANNELS = 32
        tag = "grad" if grad else "fwd "
        print(f"{tag} ({n},{h},{w},{c}): packed {results['packed']*1e3:7.2f} ms"
              f"   per-corner {results['per-corner']*1e3:7.2f} ms"
              f"   speedup {results['per-corner']/results['packed']:.2f}x",
              flush=True)

    for shape in [(4, 360, 640, 3), (4, 360, 640, 6), (4, 90, 160, 192)]:
        run_shape(*shape, grad=False)
    for shape in [(4, 360, 640, 3), (4, 360, 640, 6)]:
        run_shape(*shape, grad=True)


if __name__ == "__main__":
    main()
