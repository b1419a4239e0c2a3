"""Metric CLI (mirrors AdaAttN/eval.py:311-339).

Modes: lpips / ssim / kl / gram / moment / uni / entropy / sifid /
debug_sifid (per-dims SIFID diagnostic, AdaAttN/eval.py:278-308).
"""

import argparse

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        prog="vst_tpu.cli.evaluate",
        usage="evaluate [-h] [-m MODE] [-p0 PATH0] [-p1 PATH1]")
    p.add_argument("-m", "--mode", default="lpips",
                   choices=["lpips", "ssim", "kl", "gram", "moment", "uni",
                            "entropy", "sifid", "debug_sifid"])
    p.add_argument("-p0", "--path0", default="./results/stylized.png")
    p.add_argument("-p1", "--path1", default="./results/style.png")
    p.add_argument("--vgg19-weights", help="for gram")
    p.add_argument("--lpips-weights",
                   help="LPIPS checkpoint: vendored linear heads (.pth)")
    p.add_argument("--vgg16-weights", help="LPIPS trunk weights")
    p.add_argument("--inception-weights", help="for sifid")
    p.add_argument("--dims", type=int, default=2048,
                   help="sifid feature dims (64/192/768/2048)")
    p.add_argument("--platform", choices=["cpu", "tpu"],
                   help="pin the JAX backend (default: auto; also "
                        "honours VST_PLATFORM)")
    return p


def _load_uint8(path):
    from PIL import Image

    try:
        return np.asarray(Image.open(path).convert("RGB"))
    except FileNotFoundError:
        # the defaults mirror the reference's ./results/* paths
        # (AdaAttN/eval.py:312-320); missing files should read as "pass
        # -p0/-p1", not as a traceback
        raise SystemExit(f"error: image not found: {path} "
                         f"(pass -p0/-p1 explicitly)")


def main(argv=None):
    args = build_parser().parse_args(argv)
    from vst_tpu.cli.common import setup_jax

    setup_jax(args.platform)
    img0 = _load_uint8(args.path0)
    # single-image modes never touch path1 (matching AdaAttN/eval.py, whose
    # moment/uni/entropy read only path0)
    img1 = (None if args.mode in ("moment", "uni", "entropy")
            else _load_uint8(args.path1))
    if (img1 is not None and img0.shape != img1.shape
            and args.mode in ("ssim", "lpips")):
        # these two compare pixel-aligned maps, so the reference crashes on
        # mismatched shapes too (raw cv2.imread pairs, AdaAttN/eval.py:
        # 226-239); fail readably.  kl/gram/sifid reduce to histograms /
        # C×C grams / per-image stats and accept differing sizes.
        raise SystemExit(
            f"error: image sizes differ ({img0.shape[:2]} vs "
            f"{img1.shape[:2]}); resize to a common size for '{args.mode}'")

    if args.mode == "lpips":
        from vst_tpu.cli.common import load_weights
        from vst_tpu.eval.lpips import (
            image_to_lpips_input, load_linear_heads, lpips_vgg,
            random_lpips_params)

        if args.vgg16_weights:
            params = load_weights(args.vgg16_weights)
            params.update(load_linear_heads(args.lpips_weights))
        else:
            import sys

            print("warning: no --vgg16-weights/--lpips-weights given; "
                  "using RANDOM weights (distance is meaningless)",
                  file=sys.stderr)
            params = random_lpips_params()
        val = float(lpips_vgg(params,
                              image_to_lpips_input(img0),
                              image_to_lpips_input(img1))[0])
        print("Distance: %f" % val)
    elif args.mode == "ssim":
        import jax.numpy as jnp

        from vst_tpu.eval import ssim

        val = float(ssim(jnp.asarray(img0, jnp.float32)[None],
                         jnp.asarray(img1, jnp.float32)[None]))
        print("SSIM: %f" % val)
    elif args.mode == "kl":
        from vst_tpu.eval import kl_divergence_rgb

        # reference reads with cv2 (BGR); channel-mean KL is order-invariant
        print("KL: %f" % kl_divergence_rgb(img0, img1))
    elif args.mode == "gram":
        import jax.numpy as jnp

        from vst_tpu.cli.common import load_vgg_weights
        from vst_tpu.eval import gram_loss_5tap

        if not args.vgg19_weights:
            import sys

            print("warning: no --vgg19-weights; Gram distance uses RANDOM "
                  "VGG features", file=sys.stderr)
        vgg_params = load_vgg_weights(args.vgg19_weights, "vgg19_adaattn")
        val = float(gram_loss_5tap(vgg_params,
                                   jnp.asarray(img0, jnp.float32)[None],
                                   jnp.asarray(img1, jnp.float32)[None]))
        print("Gram Loss: %f" % val)
    elif args.mode in ("moment", "uni", "entropy"):
        from vst_tpu.eval import average_entropy, nth_order_moment, uniformity

        gray = np.asarray(
            0.299 * img0[..., 0] + 0.587 * img0[..., 1] + 0.114 * img0[..., 2]
        ).astype(np.uint8)
        if args.mode == "moment":
            print("Nth Order Moment: %f" % nth_order_moment(gray))
        elif args.mode == "uni":
            print("Uniformity: %f" % uniformity(gray))
        else:
            print("Average Entropy: %f" % average_entropy(gray))
    elif args.mode in ("sifid", "debug_sifid"):
        from vst_tpu.cli.common import load_weights
        from vst_tpu.eval.inception import init_inception
        from vst_tpu.eval.sifid import (
            activation_statistics, frechet_distance, sifid)

        if not args.inception_weights:
            import sys

            print("warning: no --inception-weights; SIFID uses RANDOM "
                  "Inception features", file=sys.stderr)
        params = (load_weights(args.inception_weights)
                  if args.inception_weights else init_inception())
        if args.mode == "sifid":
            print("SIFID: %f" % sifid(params, img0.astype(np.float32),
                                      img1.astype(np.float32), args.dims))
        else:
            # per-dims diagnostic sweep (AdaAttN/eval.py:278-308)
            print(f"Comparing: {args.path0} vs {args.path1}")
            a = img0.astype(np.float32)[None] / 255.0
            b = img1.astype(np.float32)[None] / 255.0
            for dims in (64, 192, 768, 2048):
                print(f"\n=== Testing with {dims} dimensions ===")
                m1, s1 = activation_statistics(params, a, dims)
                m2, s2 = activation_statistics(params, b, dims)
                print("Mean difference norm: %.6f" % np.linalg.norm(m1 - m2))
                print("Covariance trace 1: %.6f" % np.trace(s1))
                print("Covariance trace 2: %.6f" % np.trace(s2))
                print("SIFID with %dD: %.6f"
                      % (dims, frechet_distance(m1, s1, m2, s2)))


if __name__ == "__main__":
    main()
