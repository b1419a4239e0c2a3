"""RTNSTV StylizingNetwork (layer L2).

Parity target: RTNSTV/network.py:10-91.  Parameter keys equal the torch
``state_dict`` names.

Blocks:
- Conv   — reflection pad + conv + InstanceNorm(affine) + optional act (:10-26)
- Res    — Conv(ReLU) + Conv(None), zero-pad channel-matching skip (:29-45)
- Deconv — ConvTranspose2d(k3, s2, p=1, op=1) + IN + act (:48-60)

Network: 3→16→32→48 encoder, 5 residual 48-blocks, two transpose-conv
deconvs, Conv+tanh head scaled (x+1)/2·255 (:63-91).
"""

import jax
import jax.numpy as jnp

from vst_tpu.models.init import (
    as_rng,
    conv_init,
    conv_transpose_init,
    instance_norm_init,
)
from vst_tpu.ops import (
    conv2d,
    conv_transpose2d,
    instance_norm,
    reflection_pad2d,
)
from vst_tpu.ops.conv import conv2d_reflect1_k3s1, conv2d_reflect1_k3s2


def conv_block(params, name, x, k, stride, activation=None):
    w = params[f"{name}.conv.weight"]
    b = params[f"{name}.conv.bias"]
    if (k == 3 and stride == 2 and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0):
        x = conv2d_reflect1_k3s2(x, w, b)
    elif k == 3 and stride == 1 and x.shape[1] >= 3 and x.shape[2] >= 3:
        x = conv2d_reflect1_k3s1(x, w, b)
    else:
        x = conv2d(reflection_pad2d(x, k // 2), w, b, stride=stride)
    x = instance_norm(x, params[f"{name}.norm.weight"],
                      params[f"{name}.norm.bias"])
    if activation is not None:
        x = activation(x)
    return x


def res_block(params, name, x):
    residual = x
    out = conv_block(params, f"{name}.conv1", x, 3, 1, jax.nn.relu)
    out = conv_block(params, f"{name}.conv2", out, 3, 1, None)
    cr = residual.shape[-1]
    co = out.shape[-1]
    if cr != co:
        # zero-pad trailing channels (RTNSTV/network.py:40-43)
        residual = jnp.pad(
            residual, ((0, 0), (0, 0), (0, 0), (0, co - cr)))
    return out + residual


def deconv_block(params, name, x, activation=None):
    x = conv_transpose2d(x, params[f"{name}.deconv.weight"],
                         params[f"{name}.deconv.bias"],
                         stride=2, padding=1, output_padding=1)
    x = instance_norm(x, params[f"{name}.norm.weight"],
                      params[f"{name}.norm.bias"])
    if activation is not None:
        x = activation(x)
    return x


def _conv_params(key, name, cin, cout, k):
    w, b = conv_init(key, k, cin, cout)
    s, sb = instance_norm_init(cout)
    return {f"{name}.conv.weight": w, f"{name}.conv.bias": b,
            f"{name}.norm.weight": s, f"{name}.norm.bias": sb}


def _deconv_params(key, name, cin, cout, k=3):
    w, b = conv_transpose_init(key, k, cin, cout)
    s, sb = instance_norm_init(cout)
    return {f"{name}.deconv.weight": w, f"{name}.deconv.bias": b,
            f"{name}.norm.weight": s, f"{name}.norm.bias": sb}


def init_stylizing_network(key):
    rng = as_rng(key)
    params = {}
    for name, cin, cout in [("conv1", 3, 16), ("conv2", 16, 32),
                            ("conv3", 32, 48)]:
        params.update(_conv_params(rng, name, cin, cout, 3))
    for i in range(1, 6):
        params.update(_conv_params(rng, f"res{i}.conv1", 48, 48, 3))
        params.update(_conv_params(rng, f"res{i}.conv2", 48, 48, 3))
    params.update(_deconv_params(rng, "deconv1", 48, 32))
    params.update(_deconv_params(rng, "deconv2", 32, 16))
    params.update(_conv_params(rng, "conv4", 16, 3, 3))
    return params


def stylizing_network(params, x):
    """RTNSTV forward.  x: (N, H, W, 3) 0–255 RGB → styled 0–255 RGB."""
    x = conv_block(params, "conv1", x, 3, 1, jax.nn.relu)
    x = conv_block(params, "conv2", x, 3, 2, jax.nn.relu)
    x = conv_block(params, "conv3", x, 3, 2, jax.nn.relu)
    for i in range(1, 6):
        x = res_block(params, f"res{i}", x)
    x = deconv_block(params, "deconv1", x, jax.nn.relu)
    x = deconv_block(params, "deconv2", x, jax.nn.relu)
    x = conv_block(params, "conv4", x, 3, 1, jnp.tanh)
    return (x + 1.0) / 2.0 * 255.0
