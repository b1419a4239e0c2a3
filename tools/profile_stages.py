"""Per-stage model timing: ms/frame for each block of the 512p benchmarks.

Measures truncated-forward prefixes (conv1, conv1..conv2, ...) with the
chain-difference methodology from bench.py, then reports adjacent
differences as per-stage times.  This reproduces BENCH.md's roofline rows
(reference structures: ReCoNet/network.py:153-190, AdaAttN/network.py:63-99
+ :223-251).

Caveat: XLA compiles each truncated prefix as its own program, so layout
choices for the shared stages can differ slightly between prefixes; the
stage deltas carry ~±0.05 ms/frame of that noise plus tunnel jitter.

    python tools/profile_stages.py [--model reconet|adaattn] [--res 512]
                                   [--batch N]
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


ADAATTN_STAGES = ["vgg_encode", "attn_3_1", "attn_4_1", "attn_5_1",
                  "dec_up_add_conv1", "dec_conv2", "dec_up_cat_conv3",
                  "dec_conv4", "dec_up_conv5", "dec_conv6", "dec_up_conv7",
                  "dec_conv8"]


def build_adaattn_prefix_runner(params, vgg_params, x, fs, n_stages,
                                activation="cosine"):
    """Truncated AdaAttN video-loop prefix: per-frame VGG encode + attention
    stylizer + per-conv decoder stages (AdaAttN/network.py:63-99)."""
    import jax
    import jax.numpy as jnp

    from vst_tpu.models import adaattn, vgg
    from vst_tpu.ops import resize_bilinear

    def prefix(x):
        fc = vgg.vgg19_adaattn_features(vgg_params, x)
        if n_stages == 1:
            return jnp.stack([jnp.mean(v.astype(jnp.float32))
                              for v in fc.values()])
        fcl, fsl = list(fc.values()), list(fs.values())
        outs = []
        for i in range(min(3, n_stages - 1)):
            idx = i + 2
            c1 = adaattn.feature_down_sample(fcl, idx)
            s1 = adaattn.feature_down_sample(fsl, idx)
            outs.append(adaattn.adaattn_module(
                params, f"adaattn.{i}", fcl[idx], fsl[idx], c1, s1,
                activation, "auto"))
        if n_stages <= 4:
            return jnp.stack([jnp.mean(o.astype(jnp.float32)) for o in outs])
        x5, x4, x3 = outs[2], outs[1], outs[0]
        # keep-alive: every decoder prefix must still compute all three
        # attention branches, or DCE of not-yet-consumed ones corrupts the
        # adjacent-prefix deltas (x3 is first consumed at dec stage 3)
        keep = (jnp.mean(x3.astype(jnp.float32))
                + jnp.mean(x4.astype(jnp.float32))
                + jnp.mean(x5.astype(jnp.float32)))
        d = n_stages - 4   # decoder sub-stage count
        v = resize_bilinear(x5, (x5.shape[1] * 2, x5.shape[2] * 2)) + x4
        v = adaattn._conv_relu(params, "decoder.conv1", v)
        steps = [
            lambda v: adaattn._conv_relu(params, "decoder.conv2", v),
            lambda v: _dec_cat3(adaattn, params, resize_bilinear, v, x3),
            lambda v: adaattn._conv_relu(params, "decoder.conv4", v),
            lambda v: adaattn._conv_relu(
                params, "decoder.conv5",
                resize_bilinear(v, (v.shape[1] * 2, v.shape[2] * 2))),
            lambda v: adaattn._conv_relu(params, "decoder.conv6", v),
            lambda v: adaattn._conv_relu(
                params, "decoder.conv7",
                resize_bilinear(v, (v.shape[1] * 2, v.shape[2] * 2))),
            lambda v: adaattn._conv(params, "decoder.conv8", v),
        ]
        for fn in steps[:d - 1]:
            v = fn(v)
        return jnp.mean(v.astype(jnp.float32)) + keep

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(x, n_steps):
        def body(carry, i):
            xi = x + i.astype(x.dtype)
            out = prefix(xi)
            return jnp.mean(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(n_steps, dtype=jnp.int32))
        return acc

    return lambda n: run(x, n)


def _dec_cat3(adaattn, params, resize_bilinear, v, x3):
    v = resize_bilinear(v, (v.shape[1] * 2, v.shape[2] * 2))
    import jax.numpy as jnp
    v = jnp.concatenate([v, x3], axis=-1)
    for i in range(3):
        v = adaattn._conv_relu(params, f"decoder.conv3.{i}", v)
    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="reconet",
                    choices=["reconet", "adaattn"])
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--activation", default="cosine")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    if args.model == "reconet":
        from vst_tpu.models import reconet

        batch = args.batch or 8
        params = jax.tree.map(lambda v: jnp.asarray(v, jnp.bfloat16),
                              reconet.init_reconet(0))
        x = jnp.asarray((rng.random((batch, args.res, args.res, 3)) * 255)
                        .astype(np.float32), dtype=jnp.bfloat16)
        stages = STAGES
        runners = [build_prefix_runner(params, x, k, reconet)
                   for k in range(1, len(stages) + 1)]
    else:
        from vst_tpu.models import adaattn, vgg

        batch = args.batch or 2
        dt = jnp.bfloat16
        vgg_params = jax.tree.map(lambda v: jnp.asarray(v, dt),
                                  vgg.init_vgg19_adaattn(0))
        params = jax.tree.map(lambda v: jnp.asarray(v, dt),
                              adaattn.init_stylizing_network(1))
        style = jnp.asarray(
            (rng.random((1, args.res, args.res, 3)) * 255).astype(np.float32),
            dt)
        fs_single = jax.jit(vgg.vgg19_adaattn_features)(vgg_params, style)
        fs = {k: jnp.broadcast_to(v, (batch,) + v.shape[1:])
              for k, v in fs_single.items()}
        x = jnp.asarray((rng.random((batch, args.res, args.res, 3)) * 255)
                        .astype(np.float32), dt)
        stages = ADAATTN_STAGES
        runners = [build_adaattn_prefix_runner(params, vgg_params, x, fs, k,
                                               args.activation)
                   for k in range(1, len(stages) + 1)]

    print(f"devices: {jax.devices()}  model={args.model} res={args.res} "
          f"batch={batch}", flush=True)
    prev = 0.0
    for name, runner in zip(stages, runners):
        t = secs_per_iter(runner)
        per_frame = (t - prev) * 1e3 / batch
        cum = t * 1e3 / batch
        print(f"{name:18s} {per_frame:7.3f} ms/frame   (cumulative "
              f"{cum:7.3f} ms/frame, {1e3/cum:6.1f} fps)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
