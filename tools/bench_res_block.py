"""Fused-Pallas vs XLA residual stack at the ReCoNet serving shape.

VERDICT r3 item 8: res×5 is the largest inference stage (1.25 ms/frame,
44% MXU at 512² b8 bf16); this measures the fused conv+IN-stats /
normalize+relu-prologue kernel (kernels/res_block.py) against the plain
composition on the isolated res stack, chain-difference methodology
(BENCH.md).  Run on the TPU:

    python tools/bench_res_block.py [--batch 8] [--res 128] [--dtype bf16]
"""
import argparse
import functools
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--chunk-rows", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vst_tpu.kernels.res_block import residual_block_fused
    from vst_tpu.models import reconet

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    params = jax.tree.map(lambda v: jnp.asarray(v, dt), reconet.init_reconet(0))
    rng = np.random.default_rng(0)
    b, r = args.batch, args.res
    x = jnp.asarray(rng.standard_normal((b, r, r, 192)).astype(np.float32),
                    dtype=dt)

    def stack_xla(params, v):
        for i in range(1, 6):
            v = reconet.residual_block(params, f"res{i}", v)
        return v

    def stack_fused(params, v):
        # time the SHIPPING kernel path, not a re-implementation — any
        # future kernel change is then what this bench measures
        for i in range(1, 6):
            v = residual_block_fused(params, f"res{i}", v,
                                     chunk_rows=args.chunk_rows)
        return v

    # the kernel's (y, stats) outputs trip XLA's 16 MB output-in-VMEM stack
    # allocation at the b8 serving shape (16.63M measured) — same carve-out
    # as the serving A/B (bench.py::bench_reconet_512 fused_res)
    opts = None
    if jax.default_backend() == "tpu":
        opts = {"xla_tpu_scoped_vmem_limit_kib": "24576"}

    def chain(fn):
        @functools.partial(jax.jit, static_argnums=(2,),
                           compiler_options=opts)
        def run(params, x, n):
            def body(carry, i):
                out = fn(params, x + i.astype(x.dtype))
                return jnp.mean(out.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(n, dtype=jnp.int32))
            return acc

        return run

    def timed(run, n):
        float(run(params, x, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    short, long = 8, 40
    for name, fn in [("xla", stack_xla), ("fused", stack_fused)]:
        run = chain(fn)
        dt_s = (timed(run, long) - timed(run, short)) / (long - short)
        print(f"{name}: {dt_s * 1e3 / b:.3f} ms/frame "
              f"({dt_s * 1e3:.2f} ms/iter, res stack x5, "
              f"{args.dtype} b{b} {r}x{r})")
        # sanity: outputs agree
    a = np.asarray(jax.jit(stack_xla)(params, x).astype(jnp.float32))
    c = np.asarray(jax.jit(stack_fused, compiler_options=opts)(
        params, x).astype(jnp.float32))
    d = np.abs(a - c).max() / max(np.abs(a).max(), 1e-9)
    print(f"parity rel max diff: {d:.4g}")


if __name__ == "__main__":
    main()
