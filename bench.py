"""Benchmark: stylized frames/sec/chip at 512p (headline BASELINE.json metric).

Runs ReCoNet per-frame inference (BASELINE.json config #2: "ReCoNet per-frame
inference on a short 512p clip, pure conv forward") in bfloat16.

Measurement notes: the axon TPU tunnel has tens of ms of fixed per-call
latency and a non-blocking block_until_ready, so each measurement chains N
frames through a lax.scan inside ONE jitted call (with per-step-varying
inputs so XLA cannot hoist the model out of the loop), reduces to a scalar,
and fetches it to host.  fps is computed from the DIFFERENCE of two chain
lengths, cancelling the fixed tunnel/dispatch overhead.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/30}
(vs_baseline: target is >30 fps/chip per BASELINE.md.)
"""

import functools
import json
import time

import numpy as np


def _enable_compile_cache():
    """The axon tunnel's server-side compiles are slow and variable (hundreds
    of seconds); the persistent cache makes repeat runs sub-second."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from vst_tpu.models import reconet

    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                          reconet.init_reconet(0))

    batch = 8
    h = w = 512

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_frames(params, x, n_steps):
        def body(carry, i):
            xi = x + i.astype(jnp.bfloat16)
            out = jnp.clip(reconet.reconet(params, xi)[-1], 0, 255)
            return jnp.mean(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(n_steps, dtype=jnp.int32))
        return acc

    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((batch, h, w, 3)) * 255).astype(np.float32),
                    dtype=jnp.bfloat16)

    def timed(n_steps):
        float(run_frames(params, x, n_steps))  # compile + warm
        reps = 3
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_frames(params, x, n_steps))
            best = min(best, time.perf_counter() - t0)
        return best

    short, long = 8, 40
    t_short = timed(short)
    t_long = timed(long)
    frames = (long - short) * batch
    fps = frames / max(t_long - t_short, 1e-9)

    print(json.dumps({
        "metric": "reconet_512p_stylized_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 2),
    }))


if __name__ == "__main__":
    main()
