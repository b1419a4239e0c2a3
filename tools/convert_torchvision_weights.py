#!/usr/bin/env python
"""Convert downloaded torchvision backbone checkpoints to vst_tpu .npz.

Usage:
  python tools/convert_torchvision_weights.py vgg16 vgg16-*.pth out.npz
  python tools/convert_torchvision_weights.py vgg19 vgg19-*.pth out.npz
  python tools/convert_torchvision_weights.py inception_v3 inception_v3_*.pth out.npz

torchvision full-model checkpoints carry classifier heads we drop; feature
keys ("features.N.*" for VGG, "Mixed_*.<branch>.conv/bn.*" for Inception)
convert via vst_tpu.compat (OIHW → HWIO).
"""

import sys

import numpy as np

from vst_tpu.compat import load_pth
from vst_tpu.train.checkpoint import save_params


def main():
    kind, src, dst = sys.argv[1:4]
    params = load_pth(src)
    if kind in ("vgg16", "vgg19"):
        params = {k: v for k, v in params.items() if k.startswith("features.")}
    elif kind == "inception_v3":
        params = {k: v for k, v in params.items()
                  if (".conv." in k or ".bn." in k) and "Aux" not in k
                  and "num_batches_tracked" not in k}
    else:
        raise SystemExit(f"unknown kind {kind}")
    save_params({k: np.asarray(v) for k, v in params.items()}, dst)
    print(f"{dst}: {len(params)} arrays")


if __name__ == "__main__":
    main()
