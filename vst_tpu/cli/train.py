"""Training CLI — one command for all 8 trainer variants.

Mirrors: ReCoNet/train_single/train_{candy,starry-night,Flow_noFTL,
coco2014,Flow_SD1,Flow_SD2}.py, ReCoNet/train_multiple/train_Flow.py,
RTNSTV/train.py, AdaAttN/train_{image,video}.py.
"""

import argparse
import dataclasses

import jax.numpy as jnp
import numpy as np

from vst_tpu.cli.common import load_image_255, load_vgg_weights, load_weights
from vst_tpu.models import adaattn, reconet, rtnstv
from vst_tpu.train import config as C
from vst_tpu.train import steps
from vst_tpu.train.checkpoint import partial_init_from
from vst_tpu.train.loop import TrainingPreempted, run_training
from vst_tpu.train.state import create, make_optimizer

TRAINERS = (
    "reconet-candy", "reconet-starry-night", "reconet-noftl",
    "reconet-multiframe", "reconet-coco", "reconet-sd1", "reconet-sd2",
    "rtnstv", "adaattn-image", "adaattn-video",
)


def build_parser():
    p = argparse.ArgumentParser(prog="vst_tpu.cli.train")
    p.add_argument("--trainer", choices=TRAINERS, required=True)
    p.add_argument("--data", required=True,
                   help="dataset root (SceneFlow / coco / Videvo / WikiArt "
                        "pair root 'content_dir,style_dir')")
    p.add_argument("--style", help="style image path (per-style trainers)")
    p.add_argument("--vgg-weights", help=".npz/.pth VGG weights "
                                         "(random init if omitted)")
    p.add_argument("--teacher-weights", help="teacher ckpt for sd1/sd2")
    p.add_argument("--init-weights", help="student init ckpt (strict=False)")
    p.add_argument("--out-dir", default="./models")
    p.add_argument("--name", help="checkpoint base name (default: trainer)")
    p.add_argument("--epochs", type=int)
    p.add_argument("--batch-size", type=int)
    p.add_argument("--lr", type=float)
    p.add_argument("--img-size", type=int, nargs=2, metavar=("H", "W"))
    p.add_argument("--epoch-start", type=int, default=1)
    p.add_argument("--resume", metavar="STATE",
                   help="resume from a *_last_state checkpoint (orbax "
                        "directory, the default format; legacy .pkl files "
                        "also load) holding params + Adam moments + step; "
                        "combine with --epoch-start. 'auto' = resume from "
                        "<out-dir>/<name>_last_state when it exists (epoch "
                        "derived from the saved step), start fresh "
                        "otherwise — an idempotent restart-after-crash "
                        "entry point")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the stylizer/VGG forwards "
                        "(jax.checkpoint): trades recompute FLOPs for "
                        "activation HBM so larger batches/resolutions fit")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--loss-plots-dir",
                   help="write per-epoch loss-curve PNGs (RTNSTV/train.py)")
    p.add_argument("--metrics-jsonl", metavar="PATH",
                   help="append one JSON object per logged step (epoch, "
                        "batch, step, samples/s, every loss term)")
    p.add_argument("--heartbeat-file", metavar="PATH",
                   help="touch this file at every batch on EVERY process "
                        "— the per-host liveness signal for cli.supervise "
                        "--hang-timeout (the metrics sink only advances "
                        "on the primary host)")
    p.add_argument("--data-format", default="sceneflow",
                   choices=["sceneflow", "videvo"],
                   help="rtnstv: SceneFlow GT flow (active reference path) "
                        "or Videvo precomputed flow (RTNSTV/train.py:66-72 "
                        "commented variant)")
    p.add_argument("--data-parallel", type=int, default=0, metavar="N",
                   help="shard the batch across N devices (0 = off, "
                        "-1 = all available); params are replicated and "
                        "XLA inserts the gradient all-reduce over ICI")
    p.add_argument("--multihost", nargs="?", const="auto",
                   metavar="COORD:PORT",
                   help="multi-host training: start the JAX distributed "
                        "runtime and mesh over ALL hosts' devices. With no "
                        "value, everything is auto-detected from the TPU "
                        "pod metadata; otherwise pass process 0's "
                        "coordinator address plus --num-processes/"
                        "--process-id. Every host runs this same command "
                        "and loads only its slice of each global batch; "
                        "process 0 owns checkpoints/metrics (assumes a "
                        "shared --out-dir for resume). Implies "
                        "--data-parallel -1 unless given")
    p.add_argument("--num-processes", type=int, help="see --multihost")
    p.add_argument("--process-id", type=int, help="see --multihost")
    p.add_argument("--platform", choices=["cpu", "tpu"],
                   help="pin the JAX backend (default: auto; also "
                        "honours VST_PLATFORM)")
    p.add_argument("--save-every-steps", type=int, default=0, metavar="K",
                   help="also save the resumable full state every K batches "
                        "(0 = per-epoch only, the reference's cadence)")
    p.add_argument("--no-nan-recovery", action="store_true",
                   help="disable the non-finite-loss rollback (by default a "
                        "NaN/Inf loss rolls back to the last snapshot and "
                        "skips the batch, up to 3 times per run)")
    return p


def _override(cfg, args):
    kw = {}
    if args.epochs is not None:
        kw["epochs"] = args.epochs
    if args.batch_size is not None:
        kw["batch_size"] = args.batch_size
    if args.lr is not None:
        kw["lr"] = args.lr
    if args.img_size is not None:
        field = ("img_size" if hasattr(cfg, "img_size") else
                 "crop_size" if hasattr(cfg, "crop_size") else "frame_size")
        kw[field] = tuple(args.img_size)
    if args.remat:
        kw["remat"] = True
    return dataclasses.replace(cfg, **kw) if kw else cfg


def _style_tensor(args, size_hw=None):
    size_wh = (size_hw[1], size_hw[0]) if size_hw else None
    return jnp.asarray(load_image_255(args.style, size_wh)[None])


PER_STYLE = tuple(t for t in TRAINERS if not t.startswith("adaattn"))


def main(argv=None):
    args = build_parser().parse_args(argv)
    from vst_tpu.cli.common import setup_jax

    setup_jax(args.platform)
    if args.multihost:
        import jax

        from vst_tpu.parallel.multihost import initialize

        # keep the heartbeat alive WHILE blocked in initialize: after a
        # crash, a restarted process legitimately waits here until every
        # host's supervisor has restarted its trainer — with uniform
        # hang_timeouts that wait exceeds this process's own timeout, so a
        # frozen heartbeat would get the healthy waiting trainer killed
        # and burn a restart on every recovery
        stop_touch = None
        if args.heartbeat_file:
            import os
            import threading

            if os.path.dirname(args.heartbeat_file):
                os.makedirs(os.path.dirname(args.heartbeat_file),
                            exist_ok=True)
            open(args.heartbeat_file, "a").close()
            stop_touch = threading.Event()

            def _touch():
                while not stop_touch.wait(5.0):
                    os.utime(args.heartbeat_file, None)

            threading.Thread(target=_touch, daemon=True).start()
        try:
            initialize(None if args.multihost == "auto" else args.multihost,
                       args.num_processes, args.process_id)
        finally:
            if stop_touch is not None:
                stop_touch.set()
        if not args.data_parallel:
            args.data_parallel = -1
        print(f"multihost: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global / "
              f"{len(jax.local_devices())} local devices")
    t = args.trainer
    name = args.name or t
    if t in PER_STYLE and not args.style:
        raise SystemExit(f"error: --style is required for trainer '{t}'")

    if t.startswith("reconet") and t not in ("reconet-coco",):
        from vst_tpu.data.datasets import SceneFlowCombined

        base = {
            "reconet-candy": C.RECONET_CANDY,
            "reconet-starry-night": C.RECONET_STARRY_NIGHT,
            "reconet-noftl": C.RECONET_NOFTL,
            "reconet-multiframe": C.RECONET_MULTIFRAME,
            "reconet-sd1": C.DISTILL_SD1,
            "reconet-sd2": C.DISTILL_SD2,
        }[t]
        cfg = _override(base, args)
        vgg_params = load_vgg_weights(args.vgg_weights, "vgg16", args.seed)
        # candy resizes the style image to IMG_SIZE; others use it as-is
        style = _style_tensor(
            args, cfg.img_size if "candy" in t or "starry" in t else None)
        grams = steps.reconet_style_grams(vgg_params, style)
        opt = make_optimizer(cfg.lr)
        dataset = SceneFlowCombined(args.data, cfg.img_size,
                                    cfg.input_frame_num)
        if t in ("reconet-sd1", "reconet-sd2"):
            teacher_init = {"reconet": reconet.init_reconet,
                            "sd1": reconet.init_reconet_sd1}[cfg.teacher]
            student_init = {"sd1": reconet.init_reconet_sd1,
                            "sd2": reconet.init_reconet_sd2}[cfg.student]
            teacher = load_weights(args.teacher_weights)
            params = student_init(args.seed, cfg.input_frame_num)
            params = partial_init_from(params, teacher)
            step = steps.make_reconet_distill_step(cfg, vgg_params, grams,
                                                   teacher, opt)
        else:
            params = reconet.init_reconet(args.seed, cfg.input_frame_num)
            if args.init_weights:
                params = partial_init_from(params,
                                           load_weights(args.init_weights))
            step = steps.make_reconet_flow_step(cfg, vgg_params, grams, opt)
        state = create(params, opt)

    elif t == "reconet-coco":
        from vst_tpu.data.datasets import Coco2014

        cfg = _override(C.ReCoNetCocoConfig(), args)
        vgg_params = load_vgg_weights(args.vgg_weights, "vgg16", args.seed)
        style = _style_tensor(args)
        grams = steps.reconet_style_grams(vgg_params, style)
        opt = make_optimizer(cfg.lr)
        dataset = Coco2014(args.data, cfg.img_size)
        state = create(reconet.init_reconet(args.seed), opt)
        step = steps.make_reconet_coco_step(cfg, vgg_params, grams, opt)

    elif t == "rtnstv":
        from vst_tpu.data.datasets import SceneFlowCombined, VidevoFlow

        cfg = _override(C.RTNSTVConfig(), args)
        vgg_params = load_vgg_weights(args.vgg_weights, "vgg19_rtnstv",
                                      args.seed)
        style = _style_tensor(args)
        grams = steps.rtnstv_style_grams(vgg_params, style)
        opt = make_optimizer(cfg.lr)
        dataset = (VidevoFlow(args.data) if args.data_format == "videvo"
                   else SceneFlowCombined(args.data, cfg.img_size))
        state = create(rtnstv.init_stylizing_network(args.seed), opt)
        step = steps.make_rtnstv_step(cfg, vgg_params, grams, opt)

    elif t == "adaattn-image":
        from vst_tpu.data.datasets import CocoWikiArt

        cfg = _override(C.AdaAttNImageConfig(), args)
        vgg_params = load_vgg_weights(args.vgg_weights, "vgg19_adaattn",
                                      args.seed)
        coco_path, wikiart_path = args.data.split(",")
        dataset = CocoWikiArt(coco_path, wikiart_path, cfg.crop_size,
                              args.seed)
        opt = make_optimizer(cfg.lr)
        state = create(adaattn.init_stylizing_network(args.seed), opt)
        step = steps.make_adaattn_image_step(cfg, vgg_params, opt)

    elif t == "adaattn-video":
        from vst_tpu.data.datasets import VidevoWikiArt

        cfg = _override(C.AdaAttNVideoConfig(), args)
        vgg_params = load_vgg_weights(args.vgg_weights, "vgg19_adaattn",
                                      args.seed)
        videvo_path, wikiart_path = args.data.split(",")
        dataset = VidevoWikiArt(videvo_path, wikiart_path, args.seed)
        opt = make_optimizer(cfg.lr)
        state = create(adaattn.init_stylizing_network(args.seed), opt)
        step = steps.make_adaattn_video_step(cfg, vgg_params, opt)

    else:  # pragma: no cover
        raise ValueError(t)

    start_batch = 0
    if args.resume:
        import os

        from vst_tpu.train.checkpoint import load_state

        path = args.resume
        if path == "auto":
            # orbax directory (current default; load_state also picks up a
            # completed-but-unswapped <path>.new), then the legacy pickle
            path = os.path.join(args.out_dir, name + "_last_state")
            if (not os.path.isdir(path) and not os.path.isdir(path + ".new")
                    and not os.path.isfile(path)):
                # a bare FILE at the state path is the pickle fallback
                # save_state writes when orbax is not installed
                legacy = path + ".pkl"
                if os.path.exists(legacy):
                    path = legacy
                else:
                    print(f"auto-resume: no {path}, starting fresh")
                    path = None
        if path:
            state = load_state(path, like=state)
            if args.resume == "auto" and args.epoch_start == 1:
                n_batches = max(len(dataset) // cfg.batch_size, 1)
                args.epoch_start = int(state.step) // n_batches + 1
                # continue the interrupted epoch exactly where it stopped:
                # the shuffle is seed-derived, so skipping the already-seen
                # prefix at the index level reproduces the uninterrupted
                # data order (no batch revisited, none skipped)
                start_batch = int(state.step) % n_batches
                print(f"auto-resume: step {int(state.step)} → "
                      f"epoch {args.epoch_start}"
                      + (f" batch {start_batch + 1}" if start_batch else ""))

    if args.multihost:
        # every process must resume at the SAME data position.  Process 0
        # owns the checkpoint; a host whose --out-dir is NOT the shared
        # one finds no state under --resume auto, silently starts fresh,
        # and desyncs the collective (divergent epoch/start_batch change
        # each host's batch slicing).  Catch that here, loudly, on
        # EVERY process: an allgather-and-compare (not a broadcast) so the
        # hosts that agree with process 0 also see the mismatch and abort
        # instead of proceeding into a collective that wedges on the one
        # host that exited.
        import jax
        from jax.experimental import multihost_utils

        mine = np.asarray([args.epoch_start, start_batch,
                           int(state.step)], np.int64)
        every = np.asarray(multihost_utils.process_allgather(mine))
        if not (every == every[0]).all():
            raise SystemExit(
                f"multihost resume mismatch: process {jax.process_index()} "
                f"derived epoch/batch/step {mine.tolist()} but the cluster "
                f"disagrees ({every.tolist()}) — all hosts must see the "
                f"same --out-dir (shared storage) so --resume auto agrees")

    sharding = None
    if args.data_parallel:
        from jax.sharding import NamedSharding, PartitionSpec

        from vst_tpu.parallel import make_mesh
        from vst_tpu.parallel.multihost import replicate_global

        n = args.data_parallel if args.data_parallel > 0 else None
        mesh = make_mesh(n, ("data",))
        n_dev = mesh.devices.size
        if cfg.batch_size % n_dev:
            raise SystemExit(
                f"--batch-size {cfg.batch_size} must be divisible by the "
                f"{n_dev}-device data mesh")
        state = replicate_global(mesh, state)
        # dim 0 (batch) sharded on "data", all other dims replicated —
        # a partial PartitionSpec applies across every batch-leaf rank
        sharding = NamedSharding(mesh, PartitionSpec("data"))
        print(f"data-parallel over {n_dev} devices "
              f"({cfg.batch_size // n_dev} samples/device)")

    try:
        run_training(
            step, state, dataset,
            batch_size=cfg.batch_size, epochs=cfg.epochs,
            epoch_start=args.epoch_start, out_dir=args.out_dir,
            model_name=name, seed=args.seed, log_every=args.log_every,
            loss_plots_dir=args.loss_plots_dir, sharding=sharding,
            save_every_steps=args.save_every_steps,
            recover_nonfinite=not args.no_nan_recovery,
            start_batch=start_batch, metrics_jsonl=args.metrics_jsonl,
            heartbeat_file=args.heartbeat_file)
    except TrainingPreempted as e:
        # clean exit: the resumable checkpoint is on disk; a supervisor
        # restarts this same command with --resume auto
        print(f"preempted: {e}")
        raise SystemExit(0)


if __name__ == "__main__":
    main()
