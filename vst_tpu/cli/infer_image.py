"""Image inference CLI (mirrors AdaAttN/infer_image.py,
AdaAttN/infer_image_all.py, and single-image use of the feed-forward
models)."""

import argparse
import os

import jax.numpy as jnp

from vst_tpu.cli.common import (check_weights_match, load_image_255,
                                load_vgg_weights, load_weights,
                                save_image_255)
from vst_tpu.infer.image import stylize_adaattn, stylize_reconet, stylize_rtnstv


def build_parser():
    p = argparse.ArgumentParser(prog="vst_tpu.cli.infer_image")
    p.add_argument("--model", required=True,
                   choices=["reconet", "sd1", "sd2", "rtnstv", "adaattn"])
    p.add_argument("--weights", required=True)
    p.add_argument("--content",
                   help="image path, or directory with --all-pairs")
    p.add_argument("--style", help="style image (adaattn) or directory")
    p.add_argument("--sample-from", metavar="COCO_DIR,WIKIART_DIR",
                   help="adaattn only: sample content/style from a "
                        "CocoWikiArt pairing instead of explicit paths "
                        "(AdaAttN/infer_image.py:38-53)")
    p.add_argument("--sample-idx", type=int, default=0)
    p.add_argument("--vgg-weights")
    p.add_argument("--activation", default="softmax",
                   choices=["softmax", "cosine"])
    p.add_argument("--size", type=int, nargs=2, metavar=("H", "W"),
                   help="resize inputs (adaattn infer_image_all uses 512 512)")
    p.add_argument("--out", default="./results")
    p.add_argument("--all-pairs", action="store_true",
                   help="every content × style combination "
                        "(AdaAttN/infer_image_all.py)")
    p.add_argument("--platform", choices=["cpu", "tpu"],
                   help="pin the JAX backend (default: auto; also "
                        "honours VST_PLATFORM)")
    return p


def _load(path, size):
    wh = (size[1], size[0]) if size else None
    return jnp.asarray(load_image_255(path, wh)[None])


def main(argv=None):
    args = build_parser().parse_args(argv)
    from vst_tpu.cli.common import setup_jax

    setup_jax(args.platform)
    params = load_weights(args.weights)
    check_weights_match(params, args.model, args.weights)
    os.makedirs(args.out, exist_ok=True)

    if args.model in ("reconet", "sd1", "sd2", "rtnstv"):
        if not args.content:
            raise SystemExit("error: --content is required")
        content = _load(args.content, args.size)
        if args.model == "rtnstv":
            out = stylize_rtnstv(params, content)
        else:
            out = stylize_reconet(params, content, args.model)
        dst = os.path.join(args.out, "stylized.png")
        save_image_255(out[0], dst)
        print(dst)
        return

    vgg_params = load_vgg_weights(args.vgg_weights, "vgg19_adaattn")
    if args.sample_from:
        import jax.numpy as jnp

        from vst_tpu.data.datasets import CocoWikiArt

        coco_dir, wikiart_dir = args.sample_from.split(",")
        sample_c, sample_s = CocoWikiArt(coco_dir, wikiart_dir)[args.sample_idx]
        c = jnp.asarray(sample_c[None])
        s = jnp.asarray(sample_s[None])
        out = stylize_adaattn(vgg_params, params, c, s, args.activation)
        for name, img in (("content", c[0]), ("style", s[0]),
                          ("stylized", out[0])):
            dst = os.path.join(args.out, f"{name}.png")
            save_image_255(img, dst)
            print(dst)
        return
    if not args.content or not args.style:
        raise SystemExit("error: --content and --style (or --sample-from) "
                         "are required for adaattn")
    if args.all_pairs:
        from vst_tpu.data.datasets import list_files
        from vst_tpu.infer.image import (
            adaattn_style_state,
            stylize_adaattn_cached,
        )

        # style-major: encode each style once into its attention state and
        # reuse it across every content (same pair outputs as the
        # reference's content×style product, AdaAttN/infer_image_all.py)
        for spath in list_files(args.style):
            s = _load(spath, args.size or (512, 512))
            state = adaattn_style_state(vgg_params, params, s,
                                        args.activation)
            sname = os.path.splitext(os.path.basename(spath))[0]
            for cpath in list_files(args.content):
                c = _load(cpath, args.size or (512, 512))
                out = stylize_adaattn_cached(vgg_params, params, c, state,
                                             args.activation)
                cname = os.path.splitext(os.path.basename(cpath))[0]
                dst = os.path.join(args.out, f"{cname}__{sname}.png")
                save_image_255(out[0], dst)
                print(dst)
    else:
        c = _load(args.content, args.size)
        s = _load(args.style, args.size)
        out = stylize_adaattn(vgg_params, params, c, s, args.activation)
        dst = os.path.join(args.out, "stylized.png")
        save_image_255(out[0], dst)
        print(dst)


if __name__ == "__main__":
    main()
