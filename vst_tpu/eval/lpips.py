"""LPIPS perceptual metric (VGG flavor).

Parity target: the vendored package AdaAttN/lpips/lpips.py:24-161 with
net="vgg", as used by ``eval.py`` (lpips_loss, AdaAttN/eval.py:19-35):

- inputs scaled to [-1, 1] (``im2tensor``), then the ScalingLayer's
  shift/scale constants (lpips/lpips.py:164-171);
- VGG16 trunk sliced at relu1_2/2_2/3_3/4_3/5_3
  (lpips/pretrained_networks.py vgg16 slices);
- per-layer unit-normalization over channels (eps 1e-10), squared diff,
  calibrated 1×1 linear head (no bias), spatial mean, summed over layers.

Parameters: "features.<i>.weight/bias" (torchvision vgg16 trunk, HWIO) plus
"lin<k>.weight" heads of shape (1, 1, C_k, 1).  ``load_linear_heads``
converts the vendored checkpoint (lpips/weights/v0.1/vgg.pth, keys
"lin<k>.model.1.weight").
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from vst_tpu.models.vgg import VGG16_CFG, _layer_table
from vst_tpu.ops import conv2d, max_pool2d

# torchvision vgg16.features ReLU indices for relu1_2/2_2/3_3/4_3/5_3
LPIPS_VGG16_TAPS = (3, 8, 15, 22, 29)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def _vgg16_lpips_feats(params, x):
    taps = set(LPIPS_VGG16_TAPS)
    out = []
    for idx, kind, _, _ in _layer_table(VGG16_CFG):
        if idx > LPIPS_VGG16_TAPS[-1]:
            break
        if kind == "conv":
            x = conv2d(x, params[f"features.{idx}.weight"],
                       params[f"features.{idx}.bias"], stride=1, padding=1)
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:
            x = max_pool2d(x)
        if idx in taps:
            out.append(x)
    return out


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(feat.astype(jnp.float32)),
                            axis=-1, keepdims=True))
    return feat / (norm + eps)


@jax.jit
def lpips_vgg(params, img0, img1):
    """LPIPS distance.  img0/img1: (N, H, W, 3) RGB in [-1, 1]."""
    shift = jnp.asarray(_SHIFT, jnp.float32)
    scale = jnp.asarray(_SCALE, jnp.float32)
    x0 = (img0.astype(jnp.float32) - shift) / scale
    x1 = (img1.astype(jnp.float32) - shift) / scale
    f0 = _vgg16_lpips_feats(params, x0)
    f1 = _vgg16_lpips_feats(params, x1)
    val = 0.0
    for k, (a, b) in enumerate(zip(f0, f1)):
        diff = jnp.square(_normalize(a) - _normalize(b))
        res = conv2d(diff, params[f"lin{k}.weight"], None)
        val = val + jnp.mean(res, axis=(1, 2, 3))
    return val


def image_to_lpips_input(img_255: np.ndarray) -> np.ndarray:
    """HWC RGB 0–255 → (1, H, W, 3) in [-1, 1] (lpips.im2tensor)."""
    return (np.asarray(img_255, np.float32) / (255.0 / 2.0) - 1.0)[None]


def load_linear_heads(path: str) -> dict:
    """Convert a vendored LPIPS linear-head checkpoint
    ("lin<k>.model.1.weight" OIHW) → our "lin<k>.weight" HWIO params."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k in range(5):
        w = state[f"lin{k}.model.1.weight"].numpy()  # (1, C, 1, 1)
        out[f"lin{k}.weight"] = w.transpose(2, 3, 1, 0)  # (1, 1, C, 1)
    return out


def random_lpips_params(seed: int = 0) -> dict:
    """Random-init LPIPS params (trunk + heads) for tests/smoke runs."""
    from vst_tpu.models.init import as_rng
    from vst_tpu.models.vgg import init_params

    params = init_params(seed, VGG16_CFG, LPIPS_VGG16_TAPS[-1])
    rng = as_rng(seed + 1)
    for k, c in enumerate(LPIPS_CHANNELS):
        params[f"lin{k}.weight"] = np.abs(
            rng.standard_normal((1, 1, c, 1))).astype(np.float32) * 0.1
    return params
