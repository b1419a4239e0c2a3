"""ReCoNet stylization family: ReCoNet, ReCoNetSD1, ReCoNetSD2 (layer L2).

Parity targets: ReCoNet/network.py:63-279.  Parameter keys equal the torch
``state_dict`` names of those classes (conv weights stored HWIO).

Blocks:
- ConvLayer        — reflection pad (k//2) + conv            (:63-75)
- ConvTanh         — ConvLayer then tanh(x/255)·150 + 127.5  (:78-85)
- ConvInstRelu     — ConvLayer + InstanceNorm(affine) + ReLU (:88-98)
- UpsampleConv*    — nearest ×2 upsample + ConvLayer (+IN+ReLU) (:101-133)
- ResidualBlock    — 2×(conv+IN), ReLU after first, additive skip (:136-150)

Outputs (matching the reference's tap tuples):
- ReCoNet:    (sd1_tap, res5_features, styled)   (:178-190)
- ReCoNetSD1: (sd2_tap, sd_tap, features, styled) (:216-237)
- ReCoNetSD2: (sd_tap, features, styled)          (:262-279)

``input_frame_num`` multiplies input channels (multi-frame sliding-window
input, ReCoNet/train_multiple/train_Flow.py:22).
"""

import jax
import jax.numpy as jnp

from vst_tpu.models.init import as_rng, conv_init, instance_norm_init
from vst_tpu.ops import instance_norm, reflection_pad2d, upsample_nearest
from vst_tpu.ops.conv import (
    conv2d,
    conv2d_k3s2_s2d,
    conv2d_nearest_up2,
    conv2d_polyphase_reflect,
    conv2d_reflect1_k3s1,
    conv2d_reflect1_k3s2,
)


# ---------------------------------------------------------------- blocks

def conv_layer(params, name, x, k, stride):
    w = params[f"{name}.conv2d.weight"]
    b = params[f"{name}.conv2d.bias"]
    if (k == 3 and stride == 2 and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0):
        # pad-copy-free reflect conv (the 50 MB reflect-pad materialization
        # costs more than the conv at 512p)
        return conv2d_reflect1_k3s2(x, w, b)
    if k == 3 and stride == 1 and x.shape[1] >= 3 and x.shape[2] >= 3:
        return conv2d_reflect1_k3s1(x, w, b)
    if (k == 9 and stride == 1 and x.shape[1] % 4 == 0
            and x.shape[2] % 4 == 0):
        # 9×9 stride-1 layers (stem + ConvTanh head) have tiny channel
        # counts; the polyphase form packs 16 output pixels per MXU column,
        # and the reflect variant builds the packed pad border by phase
        # shuffling instead of a full-tensor pad copy (the pad alone cost
        # more than the packed conv — BENCH.md roofline).
        return conv2d_polyphase_reflect(x, w, b, factor=4)
    x = reflection_pad2d(x, k // 2)
    return conv2d(x, w, b, stride=stride)


def conv_tanh(params, name, x, k, stride):
    out = conv_layer(params, name, x, k, stride)
    return jnp.tanh(out / 255.0) * 150.0 + 255.0 / 2.0


def conv_inst_relu(params, name, x, k, stride):
    out = conv_layer(params, name, x, k, stride)
    out = instance_norm(out, params[f"{name}.instance.weight"],
                        params[f"{name}.instance.bias"])
    return jax.nn.relu(out)


def upsample_conv_inst_relu(params, name, x, k, upsample):
    if upsample == 2 and k == 3:
        out = conv2d_nearest_up2(x, params[f"{name}.conv2d.weight"],
                                 params[f"{name}.conv2d.bias"])
    else:
        if upsample:
            x = upsample_nearest(x, upsample)
        out = conv_layer(params, name, x, k, stride=1)
    out = instance_norm(out, params[f"{name}.instance.weight"],
                        params[f"{name}.instance.bias"])
    return jax.nn.relu(out)


def residual_block(params, name, x, k=3):
    out = conv_layer(params, f"{name}.conv1", x, k, 1)
    out = instance_norm(out, params[f"{name}.in1.weight"],
                        params[f"{name}.in1.bias"])
    out = jax.nn.relu(out)
    out = conv_layer(params, f"{name}.conv2", out, k, 1)
    out = instance_norm(out, params[f"{name}.in2.weight"],
                        params[f"{name}.in2.bias"])
    return out + x


# Serving-path gate for the fused conv+IN-stats res-block kernel
# (kernels/res_block.py).  OFF until its on-chip A/B
# (tools/bench_res_block.py) wins — the kernel is inference-only (no VJP),
# so training paths never route here regardless; see BENCH.md.
FUSED_RES_SERVING = False


def fused_res_serving(dtype) -> bool:
    return (FUSED_RES_SERVING and dtype == jnp.bfloat16
            and jax.default_backend() == "tpu")


def _res_stack(params, x, names, fused):
    if fused:
        from vst_tpu.kernels.res_block import residual_block_fused

        # off-TPU (tests, smoke benches) the kernel only runs interpreted
        interpret = jax.default_backend() != "tpu"
        for nm in names:
            x = residual_block_fused(params, nm, x, interpret=interpret)
        return x
    for nm in names:
        x = residual_block(params, nm, x)
    return x


# ------------------------------------------------------------- param init

def _conv_block(key, name, in_ch, out_ch, k, with_norm=True):
    w, b = conv_init(key, k, in_ch, out_ch)
    p = {f"{name}.conv2d.weight": w, f"{name}.conv2d.bias": b}
    if with_norm:
        s, sb = instance_norm_init(out_ch)
        p[f"{name}.instance.weight"] = s
        p[f"{name}.instance.bias"] = sb
    return p


def _res_block(rng, name, ch, k=3):
    w1, b1 = conv_init(rng, k, ch, ch)
    w2, b2 = conv_init(rng, k, ch, ch)
    s1, sb1 = instance_norm_init(ch)
    s2, sb2 = instance_norm_init(ch)
    return {
        f"{name}.conv1.conv2d.weight": w1, f"{name}.conv1.conv2d.bias": b1,
        f"{name}.in1.weight": s1, f"{name}.in1.bias": sb1,
        f"{name}.conv2.conv2d.weight": w2, f"{name}.conv2.conv2d.bias": b2,
        f"{name}.in2.weight": s2, f"{name}.in2.bias": sb2,
    }


def _build(key, spec):
    """spec: list of ("conv"|"res"|"convtanh", name, in, out, k)."""
    rng = as_rng(key)
    params = {}
    for kind, name, cin, cout, k in spec:
        if kind == "res":
            params.update(_res_block(rng, name, cout, k))
        elif kind == "convtanh":
            params.update(_conv_block(rng, name, cin, cout, k, with_norm=False))
        else:
            params.update(_conv_block(rng, name, cin, cout, k))
    return params


def init_reconet(key, input_frame_num: int = 1):
    f = 3 * input_frame_num
    spec = [
        ("conv", "conv1", f, 48, 9), ("conv", "conv2", 48, 96, 3),
        ("conv", "conv3", 96, 192, 3),
        *[("res", f"res{i}", 192, 192, 3) for i in range(1, 6)],
        ("conv", "deconv1", 192, 96, 3), ("conv", "deconv2", 96, 48, 3),
        ("convtanh", "deconv3", 48, 3, 9),
    ]
    return _build(key, spec)


def init_reconet_sd1(key, input_frame_num: int = 1):
    f = 3 * input_frame_num
    spec = [
        ("conv", "conv1", f, 32, 9), ("conv", "conv2", 32, 64, 3),
        ("conv", "conv3_sd", 64, 64, 3),
        *[("res", f"res{i}_sd", 64, 64, 3) for i in range(1, 6)],
        ("conv", "deconv1_sd", 64, 64, 3), ("conv", "deconv2", 64, 32, 3),
        ("convtanh", "deconv3", 32, 3, 9),
    ]
    return _build(key, spec)


def init_reconet_sd2(key, input_frame_num: int = 1):
    f = 3 * input_frame_num
    spec = [
        ("conv", "conv1_sd2", f, 16, 9), ("conv", "conv2_sd2", 16, 32, 3),
        ("conv", "conv3_sd2", 32, 64, 3),
        *[("res", f"res{i}_sd", 64, 64, 3) for i in range(1, 6)],
        ("conv", "deconv1_sd2", 64, 32, 3), ("conv", "deconv2_sd2", 32, 16, 3),
        ("convtanh", "deconv3_sd2", 16, 3, 9),
    ]
    return _build(key, spec)


# ---------------------------------------------------------------- forward

def reconet(params, x, fused_res=False):
    """ReCoNet forward.  x: (N, H, W, 3·input_frame_num), 0–255 RGB.

    ``fused_res``: route the res stack through the fused conv+IN-stats
    Pallas kernel (inference only — no VJP; serving paths gate on
    ``fused_res_serving``)."""
    x = conv_inst_relu(params, "conv1", x, 9, 1)
    x = conv_inst_relu(params, "conv2", x, 3, 2)
    x = conv_inst_relu(params, "conv3", x, 3, 2)
    x = _res_stack(params, x, [f"res{i}" for i in range(1, 6)], fused_res)
    features = x
    x = upsample_conv_inst_relu(params, "deconv1", x, 3, 2)
    sd1 = x
    x = upsample_conv_inst_relu(params, "deconv2", x, 3, 2)
    x = conv_tanh(params, "deconv3", x, 9, 1)
    return sd1, features, x


def reconet_sd1(params, x, fused_res=False):
    x = conv_inst_relu(params, "conv1", x, 9, 1)
    x = conv_inst_relu(params, "conv2", x, 3, 2)
    x = conv_inst_relu(params, "conv3_sd", x, 3, 2)
    sd2 = x
    x = _res_stack(params, x, [f"res{i}_sd" for i in range(1, 6)],
                   fused_res)
    features = x
    x = upsample_conv_inst_relu(params, "deconv1_sd", x, 3, 2)
    sd = x
    x = upsample_conv_inst_relu(params, "deconv2", x, 3, 2)
    x = conv_tanh(params, "deconv3", x, 9, 1)
    return sd2, sd, features, x


def reconet_sd2(params, x, fused_res=False):
    x = conv_inst_relu(params, "conv1_sd2", x, 9, 1)
    x = conv_inst_relu(params, "conv2_sd2", x, 3, 2)
    x = conv_inst_relu(params, "conv3_sd2", x, 3, 2)
    sd = x
    x = _res_stack(params, x, [f"res{i}_sd" for i in range(1, 6)],
                   fused_res)
    features = x
    x = upsample_conv_inst_relu(params, "deconv1_sd2", x, 3, 2)
    x = upsample_conv_inst_relu(params, "deconv2_sd2", x, 3, 2)
    x = conv_tanh(params, "deconv3_sd2", x, 9, 1)
    return sd, features, x
