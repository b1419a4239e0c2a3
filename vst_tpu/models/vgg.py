"""Frozen VGG16/VGG19 multi-scale feature extractors (layer L1).

Three tap sets mirror the reference exactly:

- ``vgg16_features``  — relu1_2/2_2/3_3/4_3, input pre-normalized by the
  caller (ReCoNet/network.py:9-40; the ReCoNet trainers call vgg_normalize
  explicitly, e.g. ReCoNet/train_single/train_candy.py:82-88).
- ``vgg19_rtnstv_features`` — relu1_2/2_2/3_2/4_2, ImageNet normalization
  applied inside (RTNSTV/vgg19.py:8-55, normalize at :39).
- ``vgg19_adaattn_features`` — relu1_1/2_1/3_1/4_1/5_1, normalization inside
  (AdaAttN/vgg19.py:8-63).

Parameters are keyed by torchvision ``features`` Sequential indices
("features.<i>.weight"/".bias", stored HWIO) so pretrained torchvision
state_dicts convert 1:1 (see vst_tpu/compat/torch_params.py).

TPU notes: convs run NHWC with f32 accumulation; the whole extractor is one
XLA fusion region per tap; there is no Python-side control flow.
"""

import jax
import jax.numpy as jnp

from vst_tpu.models.init import as_rng, conv_init
from vst_tpu.ops import conv2d, max_pool2d, vgg_normalize

# torchvision VGG "features" layouts: channel counts, "M" = MaxPool2d(2,2).
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

# Tap name → torchvision features index of the ReLU producing it.
VGG16_TAPS_RECONET = {"relu1_2": 3, "relu2_2": 8, "relu3_3": 15, "relu4_3": 22}
VGG19_TAPS_RTNSTV = {"relu1_2": 3, "relu2_2": 8, "relu3_2": 13, "relu4_2": 22}
VGG19_TAPS_ADAATTN = {"relu1_1": 1, "relu2_1": 6, "relu3_1": 11,
                      "relu4_1": 20, "relu5_1": 29}


def _layer_table(cfg):
    """[(features_index, kind, in_ch, out_ch)] for conv/pool/relu layers."""
    table = []
    idx = 0
    in_ch = 3
    for v in cfg:
        if v == "M":
            table.append((idx, "pool", in_ch, in_ch))
            idx += 1
        else:
            table.append((idx, "conv", in_ch, v))
            idx += 1
            table.append((idx, "relu", v, v))
            idx += 1
            in_ch = v
    return table


def init_params(key, cfg, max_index: int, dtype="float32"):
    """Random (torch-default-distribution) VGG params up to features index."""
    rng = as_rng(key)
    params = {}
    for idx, kind, in_ch, out_ch in _layer_table(cfg):
        if idx > max_index:
            break
        if kind == "conv":
            w, b = conv_init(rng, 3, in_ch, out_ch, dtype)
            params[f"features.{idx}.weight"] = w
            params[f"features.{idx}.bias"] = b
    return params


def _apply_layers(params, x, layers):
    for idx, kind in layers:
        if kind == "conv":
            x = conv2d(
                x,
                params[f"features.{idx}.weight"],
                params[f"features.{idx}.bias"],
                stride=1,
                padding=1,
            )
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:
            x = max_pool2d(x)
    return x


def _run(params, x, cfg, taps: dict[str, int], remat: bool = False):
    """Run the sliced backbone, returning the tap dict.

    ``remat=True`` wraps each inter-tap segment in ``jax.checkpoint``:
    only the tap outputs (kept anyway) survive the forward, and backward
    recomputes ONE segment's internals at a time.  Checkpointing the whole
    extractor instead would re-materialize every residual at once inside
    its backward — measured no peak-memory win; the segmented form is the
    one that actually lowers the high-water mark."""
    max_tap = max(taps.values())
    inv = {v: k for k, v in taps.items()}
    out = {}
    segment = []
    for idx, kind, _, _ in _layer_table(cfg):
        if idx > max_tap:
            break
        segment.append((idx, kind))
        if idx in inv:
            fn = _apply_layers
            if remat:
                fn = jax.checkpoint(_apply_layers, static_argnums=(2,))
            x = fn(params, x, tuple(segment))
            out[inv[idx]] = x
            segment = []
    return out


def vgg16_features(params, x, remat: bool = False):
    """ReCoNet tap set.  ``x`` must already be vgg_normalized (NHWC)."""
    return _run(params, x, VGG16_CFG, VGG16_TAPS_RECONET, remat)


def vgg19_rtnstv_features(params, x, remat: bool = False):
    """RTNSTV tap set.  ``x`` is a 0–255 NHWC RGB tensor (normalized here)."""
    return _run(params, vgg_normalize(x), VGG19_CFG, VGG19_TAPS_RTNSTV, remat)


def vgg19_adaattn_features(params, x, remat: bool = False):
    """AdaAttN tap set.  ``x`` is a 0–255 NHWC RGB tensor (normalized here)."""
    return _run(params, vgg_normalize(x), VGG19_CFG, VGG19_TAPS_ADAATTN, remat)


def init_vgg16_reconet(key, dtype="float32"):
    return init_params(key, VGG16_CFG, max(VGG16_TAPS_RECONET.values()), dtype)


def init_vgg19_rtnstv(key, dtype="float32"):
    return init_params(key, VGG19_CFG, max(VGG19_TAPS_RTNSTV.values()), dtype)


def init_vgg19_adaattn(key, dtype="float32"):
    return init_params(key, VGG19_CFG, max(VGG19_TAPS_ADAATTN.values()), dtype)
