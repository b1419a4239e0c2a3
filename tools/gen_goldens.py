#!/usr/bin/env python
"""Generate golden outputs for regression tests (tests/goldens/).

Goldens are computed with the FUNCTIONAL-TORCH oracles (tests/torch_refs.py),
i.e. they pin the REFERENCE numerics, not our implementation — so future
refactors are checked against the ground truth even in environments without
torch.  Inputs/params are deterministic (fixed seeds, tiny shapes).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from tests import torch_refs as tr
from vst_tpu.compat import jax_to_torch_arrays
from vst_tpu.models import adaattn, reconet, rtnstv, vgg

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def tstate(params):
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in jax_to_torch_arrays(params).items()}


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1).astype(np.float32)


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(1234)
    x = (rng.random((1, 32, 32, 3)) * 255).astype(np.float32)
    s = (rng.random((1, 32, 32, 3)) * 255).astype(np.float32)

    goldens = {"input_x": x, "input_s": s}

    p = reconet.init_reconet(7)
    goldens["reconet_styled"] = to_nhwc(tr.t_reconet(tstate(p), nchw(x))[-1])
    p = reconet.init_reconet_sd1(7)
    goldens["sd1_styled"] = to_nhwc(tr.t_reconet_sd1(tstate(p), nchw(x))[-1])
    p = reconet.init_reconet_sd2(7)
    goldens["sd2_styled"] = to_nhwc(tr.t_reconet_sd2(tstate(p), nchw(x))[-1])
    p = rtnstv.init_stylizing_network(7)
    goldens["rtnstv_styled"] = to_nhwc(tr.t_rtnstv(tstate(p), nchw(x)))

    vp = vgg.init_vgg19_adaattn(7)
    ap = adaattn.init_stylizing_network(7)
    ts = tstate(vp)
    t_fc = tr.t_vgg_features(ts, tr.t_vgg_normalize(nchw(x)),
                             vgg.VGG19_CFG, vgg.VGG19_TAPS_ADAATTN)
    t_fs = tr.t_vgg_features(ts, tr.t_vgg_normalize(nchw(s)),
                             vgg.VGG19_CFG, vgg.VGG19_TAPS_ADAATTN)
    for act in ("softmax", "cosine"):
        goldens[f"adaattn_{act}"] = to_nhwc(
            tr.t_adaattn_stylizer(tstate(ap), t_fc, t_fs, act))

    vp16 = vgg.init_vgg16_reconet(7)
    feats = tr.t_vgg_features(tstate(vp16), tr.t_vgg_normalize(nchw(x)),
                              vgg.VGG16_CFG, vgg.VGG16_TAPS_RECONET)
    goldens["vgg16_relu3_3"] = to_nhwc(feats["relu3_3"])

    path = os.path.join(OUT, "reference_numerics.npz")
    np.savez_compressed(path, **goldens)
    print(path, os.path.getsize(path), "bytes,", len(goldens), "arrays")


if __name__ == "__main__":
    main()
