"""Per-stage ReCoNet timing: ms/frame for each block of the 512p headline.

Measures truncated-forward prefixes (conv1, conv1..conv2, ...) with the
chain-difference methodology from bench.py, then reports adjacent
differences as per-stage times.  This reproduces BENCH.md's roofline rows
(the reference model structure is ReCoNet/network.py:153-190).

Caveat: XLA compiles each truncated prefix as its own program, so layout
choices for the shared stages can differ slightly between prefixes; the
stage deltas carry ~±0.05 ms/frame of that noise plus tunnel jitter.

    python tools/profile_stages.py [--res 512] [--batch 8]
"""
import argparse
import functools
import time

import numpy as np


STAGES = ["conv1", "conv2", "conv3", "res1", "res2", "res3", "res4", "res5",
          "deconv1", "deconv2", "head"]


def build_prefix_runner(params, x, n_stages, reconet_mod):
    import jax
    import jax.numpy as jnp

    def prefix(params, x):
        from vst_tpu.models.reconet import (
            conv_inst_relu, conv_tanh, residual_block, upsample_conv_inst_relu)
        steps = [
            lambda v: conv_inst_relu(params, "conv1", v, 9, 1),
            lambda v: conv_inst_relu(params, "conv2", v, 3, 2),
            lambda v: conv_inst_relu(params, "conv3", v, 3, 2),
        ]
        steps += [functools.partial(
            lambda i, v: residual_block(params, f"res{i}", v), i)
            for i in range(1, 6)]
        steps += [
            lambda v: upsample_conv_inst_relu(params, "deconv1", v, 3, 2),
            lambda v: upsample_conv_inst_relu(params, "deconv2", v, 3, 2),
            lambda v: conv_tanh(params, "deconv3", v, 9, 1),
        ]
        v = x
        for fn in steps[:n_stages]:
            v = fn(v)
        return v

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(params, x, n_steps):
        def body(carry, i):
            xi = x + i.astype(x.dtype)
            out = prefix(params, xi)
            return jnp.mean(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(n_steps, dtype=jnp.int32))
        return acc

    return lambda n: run(params, x, n)


def secs_per_iter(run, short=8, long=40, reps=4):
    def timed(n):
        float(run(n))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(long) - timed(short)) / (long - short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vst_tpu.models import reconet

    params = jax.tree.map(lambda v: jnp.asarray(v, jnp.bfloat16),
                          reconet.init_reconet(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((args.batch, args.res, args.res, 3)) * 255)
                    .astype(np.float32), dtype=jnp.bfloat16)

    print(f"devices: {jax.devices()}  res={args.res} batch={args.batch}",
          flush=True)
    prev = 0.0
    for k, name in enumerate(STAGES, start=1):
        t = secs_per_iter(build_prefix_runner(params, x, k, reconet))
        per_frame = (t - prev) * 1e3 / args.batch
        cum = t * 1e3 / args.batch
        print(f"{name:8s} {per_frame:7.3f} ms/frame   (cumulative "
              f"{cum:7.3f} ms/frame, {1e3/cum:6.1f} fps)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
