"""InceptionV3 feature-block extractor for SIFID.

Parity target: AdaAttN/SIFID/inception.py:6-148, which slices torchvision's
inception_v3 into 4 blocks:

- block 0 (64 ch):   Conv2d_1a_3x3, Conv2d_2a_3x3, Conv2d_2b_3x3
- block 1 (192 ch):  maxpool3s2, Conv2d_3b_1x1, Conv2d_4a_3x3
- block 2 (768 ch):  maxpool3s2, Mixed_5b..5d (InceptionA),
                     Mixed_6a (InceptionB), Mixed_6b..6e (InceptionC)
- block 3 (2048 ch): Mixed_7a (InceptionD), Mixed_7b/7c (InceptionE)

Input: (N, H, W, 3) RGB in [0, 1], scaled to [-1, 1] inside
(normalize_input, SIFID/inception.py:139-140).

Parameters are keyed by the torchvision state_dict names
("Mixed_5b.branch5x5_1.conv.weight", "...bn.running_mean", …), conv weights
HWIO; BatchNorm runs in inference mode with eps=1e-3.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vst_tpu.models.init import as_rng
from vst_tpu.ops import conv2d, max_pool2d

BLOCK_INDEX_BY_DIM = {64: 0, 192: 1, 768: 2, 2048: 3}

# (name, in_ch, out_ch, (kh, kw), stride, (ph, pw)) for every BasicConv2d.
_STEM = [
    ("Conv2d_1a_3x3", 3, 32, (3, 3), 2, (0, 0)),
    ("Conv2d_2a_3x3", 32, 32, (3, 3), 1, (0, 0)),
    ("Conv2d_2b_3x3", 32, 64, (3, 3), 1, (1, 1)),
    ("Conv2d_3b_1x1", 64, 80, (1, 1), 1, (0, 0)),
    ("Conv2d_4a_3x3", 80, 192, (3, 3), 1, (0, 0)),
]


def _basic_conv(params, name, x, stride=1, padding=(0, 0)):
    """BasicConv2d: conv (no bias) + BatchNorm(eps=1e-3) + ReLU."""
    w = params[f"{name}.conv.weight"]
    ph, pw = padding
    out = lax.conv_general_dilated(
        x, w, (stride, stride), [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    mean = params[f"{name}.bn.running_mean"].astype(jnp.float32)
    var = params[f"{name}.bn.running_var"].astype(jnp.float32)
    scale = params[f"{name}.bn.weight"].astype(jnp.float32)
    bias = params[f"{name}.bn.bias"].astype(jnp.float32)
    out = (out - mean) * (scale * jax.lax.rsqrt(var + 1e-3)) + bias
    return jax.nn.relu(out).astype(x.dtype)


def _avg_pool3(x):
    """F.avg_pool2d(x, 3, stride=1, padding=1), count_include_pad=True."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                          [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / 9.0


def _max_pool3s2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1), "VALID")


def _inception_a(params, p, x):
    b1 = _basic_conv(params, f"{p}.branch1x1", x)
    b5 = _basic_conv(params, f"{p}.branch5x5_1", x)
    b5 = _basic_conv(params, f"{p}.branch5x5_2", b5, padding=(2, 2))
    b3 = _basic_conv(params, f"{p}.branch3x3dbl_1", x)
    b3 = _basic_conv(params, f"{p}.branch3x3dbl_2", b3, padding=(1, 1))
    b3 = _basic_conv(params, f"{p}.branch3x3dbl_3", b3, padding=(1, 1))
    bp = _basic_conv(params, f"{p}.branch_pool", _avg_pool3(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(params, p, x):
    b3 = _basic_conv(params, f"{p}.branch3x3", x, stride=2)
    bd = _basic_conv(params, f"{p}.branch3x3dbl_1", x)
    bd = _basic_conv(params, f"{p}.branch3x3dbl_2", bd, padding=(1, 1))
    bd = _basic_conv(params, f"{p}.branch3x3dbl_3", bd, stride=2)
    return jnp.concatenate([b3, bd, _max_pool3s2(x)], axis=-1)


def _inception_c(params, p, x):
    b1 = _basic_conv(params, f"{p}.branch1x1", x)
    b7 = _basic_conv(params, f"{p}.branch7x7_1", x)
    b7 = _basic_conv(params, f"{p}.branch7x7_2", b7, padding=(0, 3))
    b7 = _basic_conv(params, f"{p}.branch7x7_3", b7, padding=(3, 0))
    bd = _basic_conv(params, f"{p}.branch7x7dbl_1", x)
    bd = _basic_conv(params, f"{p}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _basic_conv(params, f"{p}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _basic_conv(params, f"{p}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _basic_conv(params, f"{p}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _basic_conv(params, f"{p}.branch_pool", _avg_pool3(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, p, x):
    b3 = _basic_conv(params, f"{p}.branch3x3_1", x)
    b3 = _basic_conv(params, f"{p}.branch3x3_2", b3, stride=2)
    b7 = _basic_conv(params, f"{p}.branch7x7x3_1", x)
    b7 = _basic_conv(params, f"{p}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _basic_conv(params, f"{p}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _basic_conv(params, f"{p}.branch7x7x3_4", b7, stride=2)
    return jnp.concatenate([b3, b7, _max_pool3s2(x)], axis=-1)


def _inception_e(params, p, x):
    b1 = _basic_conv(params, f"{p}.branch1x1", x)
    b3 = _basic_conv(params, f"{p}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _basic_conv(params, f"{p}.branch3x3_2a", b3, padding=(0, 1)),
        _basic_conv(params, f"{p}.branch3x3_2b", b3, padding=(1, 0)),
    ], axis=-1)
    bd = _basic_conv(params, f"{p}.branch3x3dbl_1", x)
    bd = _basic_conv(params, f"{p}.branch3x3dbl_2", bd, padding=(1, 1))
    bd = jnp.concatenate([
        _basic_conv(params, f"{p}.branch3x3dbl_3a", bd, padding=(0, 1)),
        _basic_conv(params, f"{p}.branch3x3dbl_3b", bd, padding=(1, 0)),
    ], axis=-1)
    bp = _basic_conv(params, f"{p}.branch_pool", _avg_pool3(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_blocks(params, x, last_block: int = 3):
    """Run blocks 0..last_block; returns list of block outputs (NHWC).

    x: (N, H, W, 3) in [0, 1].
    """
    x = 2.0 * x.astype(jnp.float32) - 1.0
    outs = []
    x = _basic_conv(params, "Conv2d_1a_3x3", x, stride=2)
    x = _basic_conv(params, "Conv2d_2a_3x3", x)
    x = _basic_conv(params, "Conv2d_2b_3x3", x, padding=(1, 1))
    outs.append(x)
    if last_block >= 1:
        x = _max_pool3s2(x)
        x = _basic_conv(params, "Conv2d_3b_1x1", x)
        x = _basic_conv(params, "Conv2d_4a_3x3", x)
        outs.append(x)
    if last_block >= 2:
        x = _max_pool3s2(x)
        for p in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            x = _inception_a(params, p, x)
        x = _inception_b(params, "Mixed_6a", x)
        for p in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = _inception_c(params, p, x)
        outs.append(x)
    if last_block >= 3:
        x = _inception_d(params, "Mixed_7a", x)
        x = _inception_e(params, "Mixed_7b", x)
        x = _inception_e(params, "Mixed_7c", x)
        outs.append(x)
    return outs


# -------------------------------------------------------------- structure

def _basic_conv_specs():
    """All (name, in, out, (kh, kw)) BasicConv2d layers of the network."""
    specs = [(n, i, o, k) for n, i, o, k, _, _ in _STEM]

    def a(p, cin, pool):
        return [
            (f"{p}.branch1x1", cin, 64, (1, 1)),
            (f"{p}.branch5x5_1", cin, 48, (1, 1)),
            (f"{p}.branch5x5_2", 48, 64, (5, 5)),
            (f"{p}.branch3x3dbl_1", cin, 64, (1, 1)),
            (f"{p}.branch3x3dbl_2", 64, 96, (3, 3)),
            (f"{p}.branch3x3dbl_3", 96, 96, (3, 3)),
            (f"{p}.branch_pool", cin, pool, (1, 1)),
        ]

    def b(p, cin):
        return [
            (f"{p}.branch3x3", cin, 384, (3, 3)),
            (f"{p}.branch3x3dbl_1", cin, 64, (1, 1)),
            (f"{p}.branch3x3dbl_2", 64, 96, (3, 3)),
            (f"{p}.branch3x3dbl_3", 96, 96, (3, 3)),
        ]

    def c(p, cin, c7):
        return [
            (f"{p}.branch1x1", cin, 192, (1, 1)),
            (f"{p}.branch7x7_1", cin, c7, (1, 1)),
            (f"{p}.branch7x7_2", c7, c7, (1, 7)),
            (f"{p}.branch7x7_3", c7, 192, (7, 1)),
            (f"{p}.branch7x7dbl_1", cin, c7, (1, 1)),
            (f"{p}.branch7x7dbl_2", c7, c7, (7, 1)),
            (f"{p}.branch7x7dbl_3", c7, c7, (1, 7)),
            (f"{p}.branch7x7dbl_4", c7, c7, (7, 1)),
            (f"{p}.branch7x7dbl_5", c7, 192, (1, 7)),
            (f"{p}.branch_pool", cin, 192, (1, 1)),
        ]

    def d(p, cin):
        return [
            (f"{p}.branch3x3_1", cin, 192, (1, 1)),
            (f"{p}.branch3x3_2", 192, 320, (3, 3)),
            (f"{p}.branch7x7x3_1", cin, 192, (1, 1)),
            (f"{p}.branch7x7x3_2", 192, 192, (1, 7)),
            (f"{p}.branch7x7x3_3", 192, 192, (7, 1)),
            (f"{p}.branch7x7x3_4", 192, 192, (3, 3)),
        ]

    def e(p, cin):
        return [
            (f"{p}.branch1x1", cin, 320, (1, 1)),
            (f"{p}.branch3x3_1", cin, 384, (1, 1)),
            (f"{p}.branch3x3_2a", 384, 384, (1, 3)),
            (f"{p}.branch3x3_2b", 384, 384, (3, 1)),
            (f"{p}.branch3x3dbl_1", cin, 448, (1, 1)),
            (f"{p}.branch3x3dbl_2", 448, 384, (3, 3)),
            (f"{p}.branch3x3dbl_3a", 384, 384, (1, 3)),
            (f"{p}.branch3x3dbl_3b", 384, 384, (3, 1)),
            (f"{p}.branch_pool", cin, 192, (1, 1)),
        ]

    specs += a("Mixed_5b", 192, 32) + a("Mixed_5c", 256, 64) + a("Mixed_5d", 288, 64)
    specs += b("Mixed_6a", 288)
    for p, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                  ("Mixed_6e", 192)):
        specs += c(p, 768, c7)
    specs += d("Mixed_7a", 768)
    specs += e("Mixed_7b", 1280) + e("Mixed_7c", 2048)
    return specs


def init_inception(seed=0) -> dict:
    """Random-init full param dict (tests / smoke; real use converts the
    torchvision checkpoint via vst_tpu.compat)."""
    rng = as_rng(seed)
    params = {}
    for name, cin, cout, (kh, kw) in _basic_conv_specs():
        fan_in = cin * kh * kw
        bound = 1.0 / np.sqrt(fan_in)
        params[f"{name}.conv.weight"] = rng.uniform(
            -bound, bound, (kh, kw, cin, cout)).astype(np.float32)
        params[f"{name}.bn.weight"] = np.abs(
            rng.standard_normal(cout)).astype(np.float32) + 0.5
        params[f"{name}.bn.bias"] = (rng.standard_normal(cout) * 0.1).astype(np.float32)
        params[f"{name}.bn.running_mean"] = (
            rng.standard_normal(cout) * 0.1).astype(np.float32)
        params[f"{name}.bn.running_var"] = np.abs(
            rng.standard_normal(cout)).astype(np.float32) + 0.5
    return params
