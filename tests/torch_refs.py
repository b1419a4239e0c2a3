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


# ------------------------------------------------------------------ RAFT
# Functional re-derivation of torchvision's raft_large (models/optical_flow/
# raft.py) over a flat state_dict with torchvision's key names — the parity
# oracle for vst_tpu.models.raft + compat.raft_torchvision.  The reference
# consumes this model pretrained (AdaAttN/datasets.py:73-96, exps_video.py:42).

def _t_raft_convnorm(state, pre, x, stride, padding, norm, relu=True):
    x = F.conv2d(x, t(state, pre + ".0.weight"), stride=stride,
                 padding=padding)
    if norm == "instance":
        x = F.instance_norm(x)
    else:
        x = F.batch_norm(x, t(state, pre + ".1.running_mean"),
                         t(state, pre + ".1.running_var"),
                         t(state, pre + ".1.weight"),
                         t(state, pre + ".1.bias"), training=False)
    return F.relu(x) if relu else x


def _t_raft_res(state, pre, x, stride, norm):
    y = _t_raft_convnorm(state, pre + ".convnormrelu1", x, stride, 1, norm)
    y = _t_raft_convnorm(state, pre + ".convnormrelu2", y, 1, 1, norm)
    if f"{pre}.downsample.0.weight" in state:
        x = _t_raft_convnorm(state, pre + ".downsample", x, stride, 0, norm,
                             relu=False)
    return F.relu(x + y)


def _t_raft_encoder(state, pre, x, norm):
    x = _t_raft_convnorm(state, pre + ".convnormrelu", x, 2, 3, norm)
    for layer, strides in ((1, (1, 1)), (2, (2, 1)), (3, (2, 1))):
        for b, s in enumerate(strides):
            x = _t_raft_res(state, f"{pre}.layer{layer}.{b}", x, s, norm)
    return F.conv2d(x, t(state, pre + ".conv.weight"),
                    t(state, pre + ".conv.bias"))


def _t_corr_pyramid(f1, f2, num_levels=4):
    b, c, h, w = f1.shape
    corr = torch.matmul(f1.view(b, c, h * w).transpose(1, 2),
                        f2.view(b, c, h * w)) / (c ** 0.5)
    pyr = [corr.view(b * h * w, 1, h, w)]
    for _ in range(num_levels - 1):
        pyr.append(F.avg_pool2d(pyr[-1], 2, stride=2))
    return pyr


def _t_grid_sample_abs(img, grid):
    h, w = img.shape[-2:]
    xg = 2 * grid[..., 0] / (w - 1) - 1
    yg = 2 * grid[..., 1] / (h - 1) - 1
    return F.grid_sample(img, torch.stack([xg, yg], -1), mode="bilinear",
                         align_corners=True)


def _t_raft_lookup(pyr, coords, radius=4):
    b, _, h, w = coords.shape
    side = 2 * radius + 1
    di = torch.linspace(-radius, radius, side)
    dj = torch.linspace(-radius, radius, side)
    delta = torch.stack(torch.meshgrid(di, dj, indexing="ij"),
                        dim=-1).view(1, side, side, 2)
    centroids = coords.permute(0, 2, 3, 1).reshape(b * h * w, 1, 1, 2)
    out = []
    for vol in pyr:
        out.append(_t_grid_sample_abs(vol, centroids + delta)
                   .view(b, h, w, -1))
        centroids = centroids / 2
    return torch.cat(out, dim=-1).permute(0, 3, 1, 2)


def _t_raft_motion(state, flow, corr):
    pre = "update_block.motion_encoder"
    c = F.relu(F.conv2d(corr, t(state, pre + ".convcorr1.0.weight"),
                        t(state, pre + ".convcorr1.0.bias")))
    c = F.relu(F.conv2d(c, t(state, pre + ".convcorr2.0.weight"),
                        t(state, pre + ".convcorr2.0.bias"), padding=1))
    f = F.relu(F.conv2d(flow, t(state, pre + ".convflow1.0.weight"),
                        t(state, pre + ".convflow1.0.bias"), padding=3))
    f = F.relu(F.conv2d(f, t(state, pre + ".convflow2.0.weight"),
                        t(state, pre + ".convflow2.0.bias"), padding=1))
    cf = F.relu(F.conv2d(torch.cat([c, f], 1),
                         t(state, pre + ".conv.0.weight"),
                         t(state, pre + ".conv.0.bias"), padding=1))
    return torch.cat([cf, flow], dim=1)


def _t_convgru(state, pre, h, x, padding):
    hx = torch.cat([h, x], 1)
    z = torch.sigmoid(F.conv2d(hx, t(state, pre + ".convz.weight"),
                               t(state, pre + ".convz.bias"),
                               padding=padding))
    r = torch.sigmoid(F.conv2d(hx, t(state, pre + ".convr.weight"),
                               t(state, pre + ".convr.bias"),
                               padding=padding))
    q = torch.tanh(F.conv2d(torch.cat([r * h, x], 1),
                            t(state, pre + ".convq.weight"),
                            t(state, pre + ".convq.bias"), padding=padding))
    return (1 - z) * h + z * q


def _t_upsample_flow(flow, mask, factor=8):
    b, _, h, w = flow.shape
    mask = mask.view(b, 1, 9, factor, factor, h, w)
    mask = torch.softmax(mask, dim=2)
    uf = F.unfold(factor * flow, kernel_size=3, padding=1)
    uf = uf.view(b, 2, 9, 1, 1, h, w)
    uf = torch.sum(mask * uf, dim=2)
    return uf.permute(0, 1, 4, 2, 5, 3).reshape(b, 2, factor * h, factor * w)


def t_raft_flow(state, img1, img2, iters=12):
    """Final upsampled flow, NCHW inputs in [-1, 1]."""
    f1 = _t_raft_encoder(state, "feature_encoder", img1, "instance")
    f2 = _t_raft_encoder(state, "feature_encoder", img2, "instance")
    pyr = _t_corr_pyramid(f1, f2)

    ctx = _t_raft_encoder(state, "context_encoder", img1, "batch")
    hidden = torch.tanh(ctx[:, :128])
    context = F.relu(ctx[:, 128:])

    b, _, h8, w8 = f1.shape
    ys, xs = torch.meshgrid(torch.arange(h8, dtype=torch.float32),
                            torch.arange(w8, dtype=torch.float32),
                            indexing="ij")
    coords0 = torch.stack([xs, ys], 0)[None].repeat(b, 1, 1, 1)
    coords1 = coords0.clone()
    rb = "update_block.recurrent_block"
    for _ in range(iters):
        corr = _t_raft_lookup(pyr, coords1)
        flow = coords1 - coords0
        motion = _t_raft_motion(state, flow, corr)
        x = torch.cat([context, motion], 1)
        hidden = _t_convgru(state, rb + ".convgru1", hidden, x, (0, 2))
        hidden = _t_convgru(state, rb + ".convgru2", hidden, x, (2, 0))
        y = F.relu(F.conv2d(hidden,
                            t(state, "update_block.flow_head.conv1.weight"),
                            t(state, "update_block.flow_head.conv1.bias"),
                            padding=1))
        delta = F.conv2d(y, t(state, "update_block.flow_head.conv2.weight"),
                         t(state, "update_block.flow_head.conv2.bias"),
                         padding=1)
        coords1 = coords1 + delta
    y = F.relu(F.conv2d(hidden, t(state, "mask_predictor.convrelu.0.weight"),
                        t(state, "mask_predictor.convrelu.0.bias"),
                        padding=1))
    mask = 0.25 * F.conv2d(y, t(state, "mask_predictor.conv.weight"),
                           t(state, "mask_predictor.conv.bias"))
    return _t_upsample_flow(coords1 - coords0, mask)


def t_raft_random_state(seed=0):
    """Random raft_large state_dict with torchvision's exact keys/shapes."""
    g = torch.Generator().manual_seed(seed)
    state = {}

    def conv(name, co, ci, kh, kw, bias):
        # fan-in scaling keeps activations O(1) through the deep conv
        # chains (the BN encoder has no per-layer renormalization of
        # magnitude), so parity isn't swamped by fp noise at huge values
        scale = 0.5 / (ci * kh * kw) ** 0.5
        state[f"{name}.weight"] = torch.randn((co, ci, kh, kw),
                                              generator=g) * scale
        if bias:
            state[f"{name}.bias"] = torch.randn(co, generator=g) * 0.1

    def norm(name, ch):
        state[f"{name}.weight"] = 1 + 0.1 * torch.randn(ch, generator=g)
        state[f"{name}.bias"] = 0.1 * torch.randn(ch, generator=g)
        state[f"{name}.running_mean"] = 0.1 * torch.randn(ch, generator=g)
        state[f"{name}.running_var"] = (1 + 0.1 * torch.randn(
            ch, generator=g)).abs()

    for pre, bn in (("feature_encoder", False), ("context_encoder", True)):
        conv(f"{pre}.convnormrelu.0", 64, 3, 7, 7, False)
        if bn:
            norm(f"{pre}.convnormrelu.1", 64)
        chans = {1: (64, 64), 2: (64, 96), 3: (96, 128)}
        for layer, (ci, co) in chans.items():
            for b in range(2):
                base = f"{pre}.layer{layer}.{b}"
                cin = ci if b == 0 else co
                conv(f"{base}.convnormrelu1.0", co, cin, 3, 3, False)
                conv(f"{base}.convnormrelu2.0", co, co, 3, 3, False)
                if bn:
                    norm(f"{base}.convnormrelu1.1", co)
                    norm(f"{base}.convnormrelu2.1", co)
                if layer > 1 and b == 0:
                    conv(f"{base}.downsample.0", co, ci, 1, 1, False)
                    if bn:
                        norm(f"{base}.downsample.1", co)
        conv(f"{pre}.conv", 256, 128, 1, 1, True)

    me = "update_block.motion_encoder"
    conv(f"{me}.convcorr1.0", 256, 324, 1, 1, True)
    conv(f"{me}.convcorr2.0", 192, 256, 3, 3, True)
    conv(f"{me}.convflow1.0", 128, 2, 7, 7, True)
    conv(f"{me}.convflow2.0", 64, 128, 3, 3, True)
    conv(f"{me}.conv.0", 126, 256, 3, 3, True)
    for gate in "zrq":
        conv(f"update_block.recurrent_block.convgru1.conv{gate}",
             128, 384, 1, 5, True)
        conv(f"update_block.recurrent_block.convgru2.conv{gate}",
             128, 384, 5, 1, True)
    conv("update_block.flow_head.conv1", 256, 128, 3, 3, True)
    conv("update_block.flow_head.conv2", 2, 256, 3, 3, True)
    conv("mask_predictor.convrelu.0", 256, 128, 3, 3, True)
    conv("mask_predictor.conv", 576, 256, 1, 1, True)
    return state
