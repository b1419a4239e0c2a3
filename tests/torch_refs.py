"""Functional torch implementations of the reference architectures.

These are the parity oracles for model tests: the reference's nn.Module
compositions re-derived as pure functions over a flat state_dict (NCHW),
matching ReCoNet/network.py, RTNSTV/network.py, RTNSTV/vgg19.py,
AdaAttN/network.py and AdaAttN/vgg19.py numerics exactly.
"""

import torch
import torch.nn.functional as F

from vst_tpu.models.vgg import VGG16_CFG, VGG19_CFG, _layer_table


def t(state, key):
    v = state[key]
    return v if isinstance(v, torch.Tensor) else torch.from_numpy(v)


# ----------------------------------------------------------------- VGG

def t_vgg_features(state, x, cfg, taps):
    max_tap = max(taps.values())
    inv = {v: k for k, v in taps.items()}
    out = {}
    for idx, kind, _, _ in _layer_table(cfg):
        if idx > max_tap:
            break
        if kind == "conv":
            x = F.conv2d(x, t(state, f"features.{idx}.weight"),
                         t(state, f"features.{idx}.bias"), padding=1)
        elif kind == "relu":
            x = F.relu(x)
        else:
            x = F.max_pool2d(x, 2, 2)
        if idx in inv:
            out[inv[idx]] = x
    return out


def t_vgg_normalize(x255):
    mean = torch.tensor([0.485, 0.456, 0.406]).view(-1, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(-1, 1, 1)
    return (x255 / 255.0 - mean) / std


# ----------------------------------------------------------------- ReCoNet

def _t_conv_layer(state, pre, x, k, s):
    x = F.pad(x, [k // 2] * 4, mode="reflect")
    return F.conv2d(x, t(state, pre + ".conv2d.weight"),
                    t(state, pre + ".conv2d.bias"), stride=s)


def _t_conv_inst_relu(state, pre, x, k, s):
    x = _t_conv_layer(state, pre, x, k, s)
    x = F.instance_norm(x, weight=t(state, pre + ".instance.weight"),
                        bias=t(state, pre + ".instance.bias"))
    return F.relu(x)


def _t_upsample_conv_inst_relu(state, pre, x, k, up):
    x = F.interpolate(x, scale_factor=up)
    x = _t_conv_layer(state, pre, x, k, 1)
    x = F.instance_norm(x, weight=t(state, pre + ".instance.weight"),
                        bias=t(state, pre + ".instance.bias"))
    return F.relu(x)


def _t_conv_tanh(state, pre, x, k, s):
    x = _t_conv_layer(state, pre, x, k, s)
    return torch.tanh(x / 255) * 150 + 255 / 2


def _t_res(state, pre, x):
    out = _t_conv_layer(state, pre + ".conv1", x, 3, 1)
    out = F.instance_norm(out, weight=t(state, pre + ".in1.weight"),
                          bias=t(state, pre + ".in1.bias"))
    out = F.relu(out)
    out = _t_conv_layer(state, pre + ".conv2", out, 3, 1)
    out = F.instance_norm(out, weight=t(state, pre + ".in2.weight"),
                          bias=t(state, pre + ".in2.bias"))
    return out + x


def t_reconet(state, x):
    x = _t_conv_inst_relu(state, "conv1", x, 9, 1)
    x = _t_conv_inst_relu(state, "conv2", x, 3, 2)
    x = _t_conv_inst_relu(state, "conv3", x, 3, 2)
    for i in range(1, 6):
        x = _t_res(state, f"res{i}", x)
    features = x
    x = _t_upsample_conv_inst_relu(state, "deconv1", x, 3, 2)
    sd1 = x
    x = _t_upsample_conv_inst_relu(state, "deconv2", x, 3, 2)
    x = _t_conv_tanh(state, "deconv3", x, 9, 1)
    return sd1, features, x


def t_reconet_sd1(state, x):
    x = _t_conv_inst_relu(state, "conv1", x, 9, 1)
    x = _t_conv_inst_relu(state, "conv2", x, 3, 2)
    x = _t_conv_inst_relu(state, "conv3_sd", x, 3, 2)
    sd2 = x
    for i in range(1, 6):
        x = _t_res(state, f"res{i}_sd", x)
    features = x
    x = _t_upsample_conv_inst_relu(state, "deconv1_sd", x, 3, 2)
    sd = x
    x = _t_upsample_conv_inst_relu(state, "deconv2", x, 3, 2)
    x = _t_conv_tanh(state, "deconv3", x, 9, 1)
    return sd2, sd, features, x


def t_reconet_sd2(state, x):
    x = _t_conv_inst_relu(state, "conv1_sd2", x, 9, 1)
    x = _t_conv_inst_relu(state, "conv2_sd2", x, 3, 2)
    x = _t_conv_inst_relu(state, "conv3_sd2", x, 3, 2)
    sd = x
    for i in range(1, 6):
        x = _t_res(state, f"res{i}_sd", x)
    features = x
    x = _t_upsample_conv_inst_relu(state, "deconv1_sd2", x, 3, 2)
    x = _t_upsample_conv_inst_relu(state, "deconv2_sd2", x, 3, 2)
    x = _t_conv_tanh(state, "deconv3_sd2", x, 9, 1)
    return sd, features, x


# ----------------------------------------------------------------- RTNSTV

def _t_rt_conv(state, pre, x, k, s, act=None):
    x = F.pad(x, [k // 2] * 4, mode="reflect")
    x = F.conv2d(x, t(state, pre + ".conv.weight"),
                 t(state, pre + ".conv.bias"), stride=s)
    x = F.instance_norm(x, weight=t(state, pre + ".norm.weight"),
                        bias=t(state, pre + ".norm.bias"))
    return act(x) if act else x


def _t_rt_res(state, pre, x):
    residual = x
    out = _t_rt_conv(state, pre + ".conv1", x, 3, 1, F.relu)
    out = _t_rt_conv(state, pre + ".conv2", out, 3, 1, None)
    if residual.shape[1] != out.shape[1]:
        residual = F.pad(
            residual, (0, 0, 0, 0, 0, out.shape[1] - residual.shape[1]))
    return out + residual


def _t_rt_deconv(state, pre, x, act):
    x = F.conv_transpose2d(x, t(state, pre + ".deconv.weight"),
                           t(state, pre + ".deconv.bias"),
                           stride=2, padding=1, output_padding=1)
    x = F.instance_norm(x, weight=t(state, pre + ".norm.weight"),
                        bias=t(state, pre + ".norm.bias"))
    return act(x)


def t_rtnstv(state, x):
    x = _t_rt_conv(state, "conv1", x, 3, 1, F.relu)
    x = _t_rt_conv(state, "conv2", x, 3, 2, F.relu)
    x = _t_rt_conv(state, "conv3", x, 3, 2, F.relu)
    for i in range(1, 6):
        x = _t_rt_res(state, f"res{i}", x)
    x = _t_rt_deconv(state, "deconv1", x, F.relu)
    x = _t_rt_deconv(state, "deconv2", x, F.relu)
    x = _t_rt_conv(state, "conv4", x, 3, 1, torch.tanh)
    return (x + 1) / 2 * 255


# ----------------------------------------------------------------- AdaAttN

def _t_ada_conv(state, pre, x, k=3, s=1):
    x = F.pad(x, [k // 2] * 4, mode="reflect")
    return F.conv2d(x, t(state, pre + ".conv.weight"),
                    t(state, pre + ".conv.bias"), stride=s)


def _t_ada_conv_relu(state, pre, x):
    return F.relu(_t_ada_conv(state, pre + ".conv", x))


def t_feature_down_sample(feats, last_idx):
    size = feats[last_idx].shape[-2:]
    parts = [F.interpolate(feats[i], size=size, mode="bilinear",
                           align_corners=False) for i in range(last_idx)]
    parts.append(feats[last_idx])
    return torch.cat(parts, dim=1)


def _t_attention(q, k, activation):
    if activation == "softmax":
        return torch.softmax(torch.bmm(q, k), dim=-1)
    qn = torch.linalg.vector_norm(q, dim=-1, keepdim=True)
    kn = torch.linalg.vector_norm(k, dim=1, keepdim=True)
    s = torch.bmm(q, k) / torch.bmm(qn, kn) + 1
    return s / s.sum(dim=-1, keepdim=True)


def t_adaattn_module(state, pre, c_x, s_x, c_1x, s_1x, activation):
    """pre=None → AdaAttnNoConv."""
    qmap = F.instance_norm(c_1x)
    kmap = F.instance_norm(s_1x)
    if pre is not None:
        qmap = F.conv2d(qmap, t(state, pre + ".f.weight"), t(state, pre + ".f.bias"))
        kmap = F.conv2d(kmap, t(state, pre + ".g.weight"), t(state, pre + ".g.bias"))
        vmap = F.conv2d(s_x, t(state, pre + ".h.weight"), t(state, pre + ".h.bias"))
    else:
        vmap = s_x
    b, _, h, w = qmap.size()
    q = qmap.view(b, -1, h * w).permute(0, 2, 1)
    b, _, hk, wk = kmap.size()
    k = kmap.view(b, -1, hk * wk)
    v = vmap.view(b, -1, hk * wk).permute(0, 2, 1)
    a = _t_attention(q, k, activation)
    m = torch.bmm(a, v)
    var = torch.bmm(a, v ** 2) - m ** 2
    s = torch.sqrt(var.clamp(min=1e-6))
    b, _, h, w = c_x.size()
    m = m.view(b, h, w, -1).permute(0, 3, 1, 2)
    s = s.view(b, h, w, -1).permute(0, 3, 1, 2)
    return s * F.instance_norm(c_x) + m


def t_decoder(state, x5, x4, x3):
    up = lambda z: F.interpolate(z, scale_factor=2, mode="bilinear",
                                 align_corners=False)
    x = up(x5) + x4
    x = _t_ada_conv_relu(state, "decoder.conv1", x)
    x = _t_ada_conv_relu(state, "decoder.conv2", x)
    x = up(x)
    x = torch.cat([x, x3], dim=1)
    for i in range(3):
        x = _t_ada_conv_relu(state, f"decoder.conv3.{i}", x)
    x = _t_ada_conv_relu(state, "decoder.conv4", x)
    x = up(x)
    x = _t_ada_conv_relu(state, "decoder.conv5", x)
    x = _t_ada_conv_relu(state, "decoder.conv6", x)
    x = up(x)
    x = _t_ada_conv_relu(state, "decoder.conv7", x)
    return _t_ada_conv(state, "decoder.conv8", x)


def t_adaattn_stylizer(state, fc: dict, fs: dict, activation):
    fcl = list(fc.values())
    fsl = list(fs.values())
    outs = []
    for i in range(3):
        idx = i + 2
        c_1x = t_feature_down_sample(fcl, idx)
        s_1x = t_feature_down_sample(fsl, idx)
        outs.append(t_adaattn_module(state, f"adaattn.{i}", fcl[idx],
                                     fsl[idx], c_1x, s_1x, activation))
    return t_decoder(state, outs[2], outs[1], outs[0])
