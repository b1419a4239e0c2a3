"""Dataset visual-inspection dump — the reference's manual sanity check.

Mirrors `test_FlyingThings3D_Monkaa` (ReCoNet/datasets.py:286-324) and the
RTNSTV `test_warp` dump (RTNSTV/datasets.py:88-133): for the first N
samples of a flow dataset, save frame pairs, the backward-warped frame 1,
the occlusion mask, the masked warped frame, and an HSV flow
visualization, so a human can eyeball that flows/masks/warps line up.

Usage:
  python tools/visualize_dataset.py --data <root> \
      [--dataset combined|monkaa|ft3d|videvo] [--n 4] [--out ./dataset_viz]

Runs entirely on CPU numpy (vst_tpu.data.flow_np) — no device needed.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--dataset", default="combined",
                   choices=["combined", "monkaa", "ft3d", "videvo"])
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--img-size", type=int, nargs=2, default=(360, 640),
                   metavar=("H", "W"))
    p.add_argument("--out", default="./dataset_viz")
    args = p.parse_args(argv)

    import cv2

    from vst_tpu.data import datasets as D
    from vst_tpu.data.flow_np import visualize_flow, warp_np

    size = tuple(args.img_size)
    if args.dataset == "videvo":
        ds = D.VidevoFlow(args.data)
    elif args.dataset == "monkaa":
        ds = D.Monkaa(os.path.join(args.data, "monkaa"), size)
    elif args.dataset == "ft3d":
        ds = D.FlyingThings3D(os.path.join(args.data, "flyingthings3d"), size)
    else:
        ds = D.SceneFlowCombined(args.data, size)

    os.makedirs(args.out, exist_ok=True)
    n = min(args.n, len(ds))
    for i in range(n):
        img1, img2, flow, mask = ds[i][:4]
        img1 = np.asarray(img1, np.float32)
        img2 = np.asarray(img2, np.float32)
        flow = np.asarray(flow, np.float32)
        mask = np.asarray(mask, np.float32)
        warped = warp_np(img1, flow)

        def save(name, arr):
            path = os.path.join(args.out, f"{i:03d}_{name}.png")
            cv2.imwrite(path, np.clip(arr, 0, 255).astype(np.uint8)[..., ::-1])

        save("img1", img1)
        save("img2", img2)
        save("warped", warped)
        save("mask", np.repeat(mask[..., None] * 255, 3, axis=-1))
        save("warped_masked", warped * mask[..., None])
        flow_bgr = visualize_flow(flow)
        cv2.imwrite(os.path.join(args.out, f"{i:03d}_flow.png"), flow_bgr)
    print(f"wrote {n} sample dumps to {args.out}")


if __name__ == "__main__":
    main()
