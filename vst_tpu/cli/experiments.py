"""Experiment runners with CSV output.

Mirrors: AdaAttN/exps_image.py, exps_image_all.py (content×style metric
sweeps), exps_video.py (warping error + flow MSE), exps_sintel.py (per-scene
masked warped error), RTNSTV/experiment_Et.py, ReCoNet/experiment/
experiment_mse.py.

Flow source: the reference runs RAFT on-GPU inside dataset workers; here
flow comes from precomputed files or the offline flow tool
(vst_tpu.data.datasets.calculate_optical_flow) — SURVEY.md §7 hard part 1,
option (b).
"""

import argparse
import csv
import functools
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(prog="vst_tpu.cli.experiments")
    sub = p.add_subparsers(dest="cmd", required=True)

    # shared flags every subcommand accepts after/among its own flags,
    # matching the sibling CLIs (train/infer/evaluate)
    shared = argparse.ArgumentParser(add_help=False)
    shared.add_argument("--platform", choices=["cpu", "tpu"],
                        help="pin the JAX backend (default: auto; also "
                             "honours VST_PLATFORM)")

    pi = sub.add_parser("image", parents=[shared],
                        help="content×style stylize + metric sweep")
    pi.add_argument("--contents", required=True)
    pi.add_argument("--styles", required=True)
    pi.add_argument("--weights", required=True)
    pi.add_argument("--vgg-weights")
    pi.add_argument("--activation", default="softmax")
    pi.add_argument("--size", type=int, nargs=2, default=[512, 512],
                    metavar=("H", "W"))
    pi.add_argument("--lpips-weights", help="vendored LPIPS linear heads")
    pi.add_argument("--vgg16-weights", help="LPIPS trunk")
    pi.add_argument("--inception-weights", help="enables SIFID columns")
    pi.add_argument("--out", default="./results/results.csv")

    pv = sub.add_parser("video", parents=[shared], help="warping error + flow MSE over a video")
    pv.add_argument("--model", required=True,
                    choices=["reconet", "sd1", "sd2", "rtnstv"])
    pv.add_argument("--weights", required=True)
    pv.add_argument("--video", required=True)
    pv.add_argument("--size", type=int, nargs=2, default=[640, 360],
                    metavar=("W", "H"))
    pv.add_argument("--flow-engine", default="farneback",
                    choices=["farneback", "raft"])
    pv.add_argument("--raft-weights")

    pe = sub.add_parser("sintel-et", parents=[shared], help="RTNSTV Et over Sintel scenes")
    pe.add_argument("--weights", required=True)
    pe.add_argument("--sintel", required=True,
                    help="MPI-Sintel-complete root")
    pe.add_argument("--scenes", nargs="*", default=["alley_1"])
    pe.add_argument("--out", default="./results/sintel_et.csv")

    pa = sub.add_parser("sintel-ada", parents=[shared],
                        help="AdaAttN Sintel masked warped error "
                             "(exps_sintel.py)")
    pa.add_argument("--weights", required=True)
    pa.add_argument("--style", required=True)
    pa.add_argument("--vgg-weights")
    pa.add_argument("--sintel", required=True)
    pa.add_argument("--scenes", nargs="*",
                    default=["alley_1", "ambush_4", "bandage_1",
                             "market_2", "temple_2"])
    pa.add_argument("--activation", default="cosine")
    pa.add_argument("--flow-engine", default="gt",
                    choices=["gt", "farneback", "raft"],
                    help="gt = Sintel GT .flo + occlusion masks; raft needs "
                         "--raft-weights (reference used RAFT)")
    pa.add_argument("--raft-weights")
    pa.add_argument("--metric", default="mae", choices=["mae", "mse"])
    pa.add_argument("--size", type=int, nargs=2, default=[256, 512],
                    metavar=("H", "W"))
    pa.add_argument("--out", default="./results/sintel_results.csv")

    pm = sub.add_parser("mse", parents=[shared], help="ReCoNet video temporal MSE")
    pm.add_argument("--model", default="reconet",
                    choices=["reconet", "sd1", "sd2"])
    pm.add_argument("--weights", required=True)
    pm.add_argument("--video", required=True)
    pm.add_argument("--input-frame-num", type=int, default=1)
    return p


def _metric_row(img0, img1, vgg_params):
    """The metric battery used by exps_image.py (sans LPIPS/SIFID which
    need pretrained weights; included when available via evaluate CLI).

    ``vgg_params=None`` omits the VGG-dependent gram column entirely —
    a random-backbone Gram distance is a meaningless number, not a metric.
    """
    import jax.numpy as jnp

    from vst_tpu.eval import (
        average_entropy,
        gram_loss_5tap,
        kl_divergence_rgb,
        nth_order_moment,
        ssim,
        uniformity,
    )

    a8 = np.clip(img0, 0, 255).astype(np.uint8)
    b8 = np.clip(img1, 0, 255).astype(np.uint8)
    gray = np.asarray(0.299 * a8[..., 0] + 0.587 * a8[..., 1]
                      + 0.114 * a8[..., 2]).astype(np.uint8)
    row = {
        "ssim": float(ssim(jnp.asarray(img0, jnp.float32)[None],
                           jnp.asarray(img1, jnp.float32)[None])),
        "kl": kl_divergence_rgb(a8, b8),
        "moment": nth_order_moment(gray),
        "uniformity": uniformity(gray),
        "entropy": average_entropy(gray),
    }
    if vgg_params is not None:
        row["gram"] = float(gram_loss_5tap(
            vgg_params, jnp.asarray(img0, jnp.float32)[None],
            jnp.asarray(img1, jnp.float32)[None]))
    return row


def run_image(args):
    import jax.numpy as jnp

    from vst_tpu.cli.common import load_image_255, load_vgg_weights, load_weights
    from vst_tpu.data.datasets import list_files
    from vst_tpu.infer.image import stylize_adaattn

    params = load_weights(args.weights)
    vgg_params = load_vgg_weights(args.vgg_weights, "vgg19_adaattn")
    metric_vgg = vgg_params if args.vgg_weights else None
    if metric_vgg is None:
        import sys

        print("warning: no --vgg-weights; gram columns omitted from the CSV "
              "(random-backbone Gram distance is meaningless)",
              file=sys.stderr)

    lpips_fn = sifid_fn = None
    if args.vgg16_weights and args.lpips_weights:
        from vst_tpu.eval.lpips import (
            image_to_lpips_input, load_linear_heads, lpips_vgg)

        lp = load_weights(args.vgg16_weights)
        lp.update(load_linear_heads(args.lpips_weights))
        lpips_fn = lambda a, b: float(lpips_vgg(
            lp, image_to_lpips_input(a), image_to_lpips_input(b))[0])
    if args.inception_weights:
        from vst_tpu.eval.sifid import sifid as sifid_metric

        ip = load_weights(args.inception_weights)
        sifid_fn = lambda a, b: sifid_metric(ip, a, b)

    h, w = args.size
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    rows = []
    for cpath in list_files(args.contents):
        for spath in list_files(args.styles):
            c = jnp.asarray(load_image_255(cpath, (w, h))[None])
            s = jnp.asarray(load_image_255(spath, (w, h))[None])
            cs = np.asarray(stylize_adaattn(vgg_params, params, c, s,
                                            args.activation))[0]
            row = {"content": os.path.basename(cpath),
                   "style": os.path.basename(spath)}
            row.update({f"style_{k}": v for k, v in
                        _metric_row(cs, np.asarray(s)[0], metric_vgg).items()})
            row.update({f"content_{k}": v for k, v in
                        _metric_row(cs, np.asarray(c)[0], metric_vgg).items()})
            if lpips_fn:
                row["lpips_content"] = lpips_fn(cs, np.asarray(c)[0])
                row["lpips_style"] = lpips_fn(cs, np.asarray(s)[0])
            if sifid_fn:
                row["sifid_style"] = sifid_fn(cs, np.asarray(s)[0])
            rows.append(row)
            print(row["content"], row["style"], f"ssim={row['style_ssim']:.4f}")
    if rows:
        avg = {"content": "average", "style": ""}
        for k in rows[0]:
            if k not in ("content", "style"):
                avg[k] = float(np.mean([r[k] for r in rows]))
        rows.append(avg)
        with open(args.out, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0]))
            writer.writeheader()
            writer.writerows(rows)
    print(args.out)


def run_video(args):
    import cv2
    import jax.numpy as jnp

    from vst_tpu.cli.common import load_weights
    from vst_tpu.data.flow_np import flow_warp_mask_np
    from vst_tpu.eval.temporal import flow_mse, map_batched, warping_error_terms
    from vst_tpu.infer.image import stylize_reconet, stylize_rtnstv
    from vst_tpu.infer.video import frames_from_video

    params = load_weights(args.weights)
    if args.model == "rtnstv":
        model_fn = functools.partial(stylize_rtnstv, params)
    else:
        model_fn = functools.partial(stylize_reconet, params,
                                     family=args.model)

    def flow(a, b):
        ga = cv2.cvtColor(a.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        gb = cv2.cvtColor(b.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        return cv2.calcOpticalFlowFarneback(
            ga, gb, None, 0.5, 5, 15, 3, 5, 1.2, 0)

    # Stream in fixed-size chunks: each chunk is stylized in ONE device call
    # and its pair terms evaluated in ONE batched dispatch (bounded host
    # memory; the reference loops batch-1 per frame, exps_video.py:54-117).
    batch = 8
    total, count, fmse = 0.0, 0, 0.0
    carry = None  # (last content frame, last styled frame) across chunks
    chunk: list = []

    def process(chunk, carry):
        nonlocal total, count, fmse
        styled = map_batched(model_fn, np.stack(chunk).astype(np.float32),
                             batch)
        contents = list(chunk)
        styled = list(styled)
        if carry is not None:
            contents.insert(0, carry[0])
            styled.insert(0, carry[1])
        f10s, masks = [], []
        for c1, c2, cs1, cs2 in zip(contents[:-1], contents[1:],
                                    styled[:-1], styled[1:]):
            f01, f10 = flow(c1, c2), flow(c2, c1)
            f10s.append(f10)
            masks.append(flow_warp_mask_np(f01, f10))
            fmse += flow_mse(f10, flow(cs2, cs1))
        if f10s:
            terms = map_batched(
                warping_error_terms,
                (np.stack(styled[:-1]).astype(np.float32),
                 np.stack(styled[1:]).astype(np.float32),
                 np.stack(f10s).astype(np.float32),
                 np.stack(masks).astype(np.float32)), batch)
            total += float(terms.sum())
            count += len(f10s)
        return (contents[-1], styled[-1])

    for frame in frames_from_video(args.video, tuple(args.size), "linear"):
        chunk.append(frame)
        if len(chunk) == batch:
            carry = process(chunk, carry)
            chunk = []
    if chunk:
        carry = process(chunk, carry)
    warping_error = float(np.sqrt(total / count))
    print(f"Warping Error: {warping_error}")
    print(f"Flow MSE: {fmse / count}")


def run_sintel_et(args):
    import jax.numpy as jnp

    from vst_tpu.cli.common import load_weights
    from vst_tpu.data.datasets import list_files, load_image
    from vst_tpu.data.flowio import read_sintel_flo
    from vst_tpu.eval.temporal import temporal_error_sintel
    from vst_tpu.infer.image import stylize_rtnstv

    params = load_weights(args.weights)
    model_fn = functools.partial(stylize_rtnstv, params)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    rows = []
    for scene in args.scenes:
        frames = [load_image(p, (640, 360))
                  for p in list_files(
                      os.path.join(args.sintel, "training/final", scene))]
        flow_files = list_files(
            os.path.join(args.sintel, "training/flow", scene))
        mask_files = list_files(
            os.path.join(args.sintel, "training/occlusions", scene))
        from vst_tpu.data.flow_np import resize_flow_np

        flows = [resize_flow_np(read_sintel_flo(p), (360, 640))
                 for p in flow_files]
        masks = [(load_image(p, (640, 360), mode="L")[..., 0] == 0)
                 .astype(np.float32) for p in mask_files]
        et = temporal_error_sintel(model_fn, frames, flows, masks)
        rows.append({"scene": scene, "Et": et})
        print(scene, et)
    with open(args.out, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["scene", "Et"])
        writer.writeheader()
        writer.writerows(rows)
    print(args.out)


def run_sintel_ada(args):
    import functools

    import jax
    import jax.numpy as jnp

    from vst_tpu.cli.common import load_image_255, load_vgg_weights, load_weights
    from vst_tpu.data.datasets import list_files, load_image
    from vst_tpu.data.flow_np import flow_warp_mask_np, resize_flow_np
    from vst_tpu.data.flowio import read_sintel_flo
    from vst_tpu.eval.temporal import map_batched, sintel_optical_loss_terms
    from vst_tpu.models import adaattn as adaattn_m
    from vst_tpu.models import vgg as vgg_m

    h, w = args.size
    params = load_weights(args.weights)
    vgg_params = load_vgg_weights(args.vgg_weights, "vgg19_adaattn")
    style = jnp.asarray(load_image_255(args.style, (w, h))[None])
    # style features encoded ONCE, content frames stylized in fixed-size
    # batches (the reference stylizes batch-1 per frame, exps_sintel.py:75-80)
    fs_single = jax.jit(vgg_m.vgg19_adaattn_features)(vgg_params, style)

    @jax.jit
    def stylize_batch(content):
        fc = vgg_m.vgg19_adaattn_features(vgg_params,
                                          content.astype(jnp.float32))
        n = content.shape[0]
        fs = {k: jnp.broadcast_to(v, (n,) + v.shape[1:])
              for k, v in fs_single.items()}
        cs = adaattn_m.stylizing_network(params, fc, fs, args.activation)
        return jnp.clip(cs, 0, 255) / 255.0

    def flows_and_mask(scene, idx, frames):
        """Returns (swap, flow, mask): with GT forward flow the roles swap —
        warp(cs2, flow_fwd) reconstructs frame 1 (as RTNSTV's Et does,
        RTNSTV/utilities.py:232-236); with estimated backward flow the
        reference warps cs1 toward frame 2 (exps_sintel.py:92)."""
        if args.flow_engine == "gt":
            flo = list_files(os.path.join(args.sintel, "training/flow", scene))
            occ = list_files(os.path.join(args.sintel, "training/occlusions",
                                          scene))
            flow01 = resize_flow_np(read_sintel_flo(flo[idx]), (h, w))
            mask = (load_image(occ[idx], (w, h), mode="L")[..., 0] == 0)
            return True, flow01, mask.astype(np.float32)
        if args.flow_engine == "raft":
            from vst_tpu.models.raft import raft_flow

            if not hasattr(flows_and_mask, "raft_params"):
                flows_and_mask.raft_params = load_weights(args.raft_weights)
            rp = flows_and_mask.raft_params
            a = jnp.asarray(frames[idx][None] / 127.5 - 1.0, jnp.float32)
            b = jnp.asarray(frames[idx + 1][None] / 127.5 - 1.0, jnp.float32)
            f01 = np.asarray(raft_flow(rp, a, b))[0]
            f10 = np.asarray(raft_flow(rp, b, a))[0]
            return False, f10, flow_warp_mask_np(f01, f10)
        import cv2

        ga = cv2.cvtColor(frames[idx].astype(np.uint8), cv2.COLOR_RGB2GRAY)
        gb = cv2.cvtColor(frames[idx + 1].astype(np.uint8),
                          cv2.COLOR_RGB2GRAY)
        f01 = cv2.calcOpticalFlowFarneback(ga, gb, None, 0.5, 5, 15, 3, 5,
                                           1.2, 0)
        f10 = cv2.calcOpticalFlowFarneback(gb, ga, None, 0.5, 5, 15, 3, 5,
                                           1.2, 0)
        return False, f10, flow_warp_mask_np(f01, f10)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    batch = 8
    loss_fn = functools.partial(sintel_optical_loss_terms,
                                use_mae=(args.metric == "mae"))
    rows = []
    for scene in args.scenes:
        frame_files = list_files(
            os.path.join(args.sintel, "training/final", scene))
        frames = [load_image(p, (w, h)) for p in frame_files]
        count = len(frames) - 1
        styled = map_batched(stylize_batch,
                             np.stack(frames).astype(np.float32), batch)
        pair_data = [flows_and_mask(scene, i, frames) for i in range(count)]
        flows = np.stack([p[1] for p in pair_data]).astype(np.float32)
        masks = np.stack([p[2] for p in pair_data]).astype(np.float32)
        # with GT forward flow src/dst swap (see flows_and_mask docstring) —
        # the engine is uniform per run, so the whole scene batches one way
        src, dst = ((styled[1:], styled[:-1]) if pair_data[0][0]
                    else (styled[:-1], styled[1:]))
        per_pair = map_batched(loss_fn, (src, dst, flows, masks), batch)
        total = float(per_pair.sum())
        loss = float(np.sqrt(total) / count)
        rows.append({"Scene": scene, "Optical Flow Loss": loss})
        print(scene, loss)
    with open(args.out, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["Scene", "Optical Flow Loss"])
        writer.writeheader()
        writer.writerows(rows)
    print(args.out)


def run_mse(args):
    from vst_tpu.cli.common import load_weights
    from vst_tpu.eval.temporal import temporal_mse
    from vst_tpu.infer.image import stylize_reconet
    from vst_tpu.infer.video import frames_from_video

    params = load_weights(args.weights)
    model_fn = functools.partial(stylize_reconet, params, family=args.model)
    frames = frames_from_video(args.video, (640, 360), "linear")
    print(temporal_mse(model_fn, frames, args.input_frame_num))


def main(argv=None):
    args = build_parser().parse_args(argv)
    from vst_tpu.cli.common import setup_jax

    setup_jax(args.platform)
    {"image": run_image, "video": run_video, "sintel-et": run_sintel_et,
     "sintel-ada": run_sintel_ada, "mse": run_mse}[args.cmd](args)


if __name__ == "__main__":
    main()
