"""Peak-HBM effect of segmented rematerialization (cfg.remat).

Compile-only (no step executes): lowers the AdaAttN video train step —
the biggest-memory trainer family (BENCH.md: 7.36 GiB f32 at the
reference shape) — with and without ``remat`` and prints the compiled
memory analysis.  Run on the real TPU backend; the CPU backend's
memory analysis does not model TPU buffer scheduling (measured flat
there even though the lowering carries the remat optimization_barrier).

    python tools/measure_remat.py [--shape H W] [--batch N] [--dtype d]
"""

import argparse
import dataclasses

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", type=int, nargs=2, default=(256, 512),
                   metavar=("H", "W"))
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from vst_tpu.models import adaattn, vgg
    from vst_tpu.train import config as C
    from vst_tpu.train import steps
    from vst_tpu.train.state import create, make_optimizer

    h, w = args.shape
    b = args.batch
    base = dataclasses.replace(
        C.AdaAttNVideoConfig(), frame_size=(h, w), batch_size=b,
        dtype=args.dtype)
    vp = vgg.init_vgg19_adaattn(0)
    opt = make_optimizer(base.lr)
    state = create(adaattn.init_stylizing_network(0), opt)
    batch = tuple(jnp.zeros((b, h, w, 3), jnp.float32) for _ in range(3))

    for name, cfg in (("plain", base),
                      ("remat", dataclasses.replace(base, remat=True))):
        step = steps.make_adaattn_video_step(cfg, vp, opt)
        comp = step.lower(state, batch).compile()
        ma = comp.memory_analysis()
        peak = getattr(ma, "temp_size_in_bytes", 0)
        args_b = getattr(ma, "argument_size_in_bytes", 0)
        out_b = getattr(ma, "output_size_in_bytes", 0)
        print(f"{name}: temp {peak / 2**30:.3f} GiB  "
              f"(args {args_b / 2**30:.2f} + out {out_b / 2**30:.2f} GiB)  "
              f"shape {h}x{w} b{b} {args.dtype}", flush=True)


if __name__ == "__main__":
    main()
