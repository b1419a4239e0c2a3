"""Functional-torch re-derivations of the reference TRAINING LOOPS.

These compose the forward oracles from tests/torch_refs.py with torch
re-derivations of each reference trainer's loss block, then run real
``torch.autograd`` + ``torch.optim.Adam`` trajectories.  They are the
whole-train-step parity oracles for tests/test_train_parity.py: N identical
steps from identical init and batches must produce the same per-step losses
and the same final parameters as the jitted vst_tpu steps.

Loss compositions mirror the reference scripts line-for-line:
- ReCoNet flow:   ReCoNet/train_single/train_candy.py:63-152
- ReCoNet COCO:   ReCoNet/train_single/train_coco2014.py:28-105
- Distillation:   ReCoNet/train_single/train_Flow_SD1.py:33-185 (SD loss
  computed but EXCLUDED from the total, :162)
- RTNSTV:         RTNSTV/train.py:36-141
- AdaAttN image:  AdaAttN/train_image.py:70-110
- AdaAttN video:  AdaAttN/train_video.py:70-122

The oracles run in float64 so the torch side is the "true" trajectory and
all comparison error is attributable to the f32 JAX side.
"""

import torch
import torch.nn.functional as F

from vst_tpu.models.vgg import (VGG16_CFG, VGG19_CFG, VGG16_TAPS_RECONET,
                                VGG19_TAPS_RTNSTV, VGG19_TAPS_ADAATTN)
from tests.torch_refs import (t_vgg_features, t_vgg_normalize, t_reconet,
                              t_reconet_sd1, t_reconet_sd2, t_rtnstv,
                              t_adaattn_stylizer, t_adaattn_module,
                              t_feature_down_sample)

T_RECONET_FORWARD = {"reconet": t_reconet, "sd1": t_reconet_sd1,
                     "sd2": t_reconet_sd2}


def t_warp(x, flo):
    """ReCoNet/utilities.py:39-57 backward warp (NCHW, flow NCHW)."""
    B, C, H, W = x.size()
    xx = torch.arange(0, W, dtype=x.dtype).view(1, -1).repeat(H, 1)
    yy = torch.arange(0, H, dtype=x.dtype).view(-1, 1).repeat(1, W)
    grid = torch.cat((xx.view(1, 1, H, W).repeat(B, 1, 1, 1),
                      yy.view(1, 1, H, W).repeat(B, 1, 1, 1)), 1)
    vgrid = grid + flo
    vx = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    vy = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    return F.grid_sample(x, torch.stack([vx, vy], dim=3), mode="bilinear",
                         padding_mode="zeros", align_corners=False)


def t_gram_chw(f):
    """Gram /(C·H·W) — ReCoNet/utilities.py:93-98."""
    b, ch, h, w = f.shape
    fl = f.view(b, ch, h * w)
    return fl.bmm(fl.transpose(1, 2)) / (ch * h * w)


def t_gram_hw(f):
    """Gram /(H·W) — RTNSTV/utilities.py:155-160."""
    b, ch, h, w = f.shape
    fl = f.view(b, ch, h * w)
    return fl.bmm(fl.transpose(1, 2)) / (h * w)


def t_reconet_ftl(f1, f2, flow, mask):
    """Feature temporal loss — train_candy.py:91-106 (flow/mask NCHW/(N,H,W))."""
    feature_flow = F.interpolate(flow, size=f1.shape[2:], mode="bilinear")
    feature_flow = feature_flow * torch.tensor(
        [f1.shape[3] / flow.shape[3], f1.shape[2] / flow.shape[2]],
        dtype=f1.dtype).view(1, 2, 1, 1)
    warped = t_warp(f1, feature_flow)
    fmask = F.interpolate(mask.unsqueeze(1), size=f1.shape[2:],
                          mode="bilinear").squeeze(1)
    fmask = (fmask > 0).to(f1.dtype).unsqueeze(1).expand(-1, f1.shape[1], -1, -1)
    loss = torch.sum(fmask * torch.square(f2 - warped))
    return loss / torch.count_nonzero(fmask)


def t_reconet_otl(i1n, i2n, s1n, s2n, flow, mask):
    """Output temporal loss with Rec.709 luma input term — train_candy.py:108-123."""
    output_term = s2n - t_warp(s1n, flow)
    input_term = i2n - t_warp(i1n, flow)
    luma = (0.2126 * input_term[:, 0] + 0.7152 * input_term[:, 1]
            + 0.0722 * input_term[:, 2])
    input_term = luma.unsqueeze(1).expand(-1, 3, -1, -1)
    cmask = mask.unsqueeze(1).expand(-1, 3, -1, -1)
    loss = torch.sum(cmask * torch.square(output_term - input_term))
    return loss / torch.count_nonzero(cmask)


def t_tv_sum(x):
    """Raw-sum total variation — train_candy.py:140-145."""
    reg1 = torch.square(x[:, :, :-1, 1:] - x[:, :, :-1, :-1])
    reg2 = torch.square(x[:, :, 1:, :-1] - x[:, :, :-1, :-1])
    return torch.sum(reg1 + reg2)


# ------------------------------------------------------------ per-family losses
# Each takes (params, frozen, batch) and returns the scalar total loss.
# ``frozen`` carries vgg state / style grams / teacher state as f64 tensors.

def reconet_flow_loss(cfg, fwd, params, frozen, batch):
    img1, img2, flow, mask = batch
    _, fmap1, s1 = fwd(params, img1)[-3:]
    _, fmap2, s2 = fwd(params, img2)[-3:]
    return reconet_flow_like_outputs(cfg, frozen, (fmap1, s1), (fmap2, s2),
                                     img1, img2, flow, mask)


def reconet_coco_loss(cfg, params, frozen, batch):
    (img,) = batch
    *_, styled = t_reconet(params, img)
    sn, inorm = t_vgg_normalize(styled), t_vgg_normalize(img)
    taps = lambda x: list(t_vgg_features(frozen["vgg"], x, VGG16_CFG,
                                         VGG16_TAPS_RECONET).values())
    sf, cf = taps(sn), taps(inorm)
    content = F.mse_loss(sf[2], cf[2]) * cfg.alpha
    style = 0.0
    for f, gs in zip(sf, frozen["grams"]):
        style = style + F.mse_loss(t_gram_chw(f), gs.expand(f.shape[0], -1, -1))
    return content + style * cfg.beta


def reconet_distill_loss(cfg, params, frozen, batch):
    """SD loss computed by the reference but excluded from the total
    (train_Flow_SD1.py:162) — the trajectory only sees the base losses
    through the STUDENT forward."""
    img1, img2, flow, mask = batch
    fwd = T_RECONET_FORWARD[cfg.student]
    s1 = fwd(params, img1)
    s2 = fwd(params, img2)
    base = reconet_flow_like_outputs(cfg, frozen, (s1[-2], s1[-1]),
                                     (s2[-2], s2[-1]), img1, img2, flow, mask)
    if cfg.include_sd_in_total:
        t1 = T_RECONET_FORWARD[cfg.teacher](frozen["teacher"], img1)
        t2 = T_RECONET_FORWARD[cfg.teacher](frozen["teacher"], img2)
        sd = (F.mse_loss(t1[cfg.teacher_tap].detach(), s1[cfg.student_tap])
              + F.mse_loss(t2[cfg.teacher_tap].detach(), s2[cfg.student_tap]))
        base = base + sd * (cfg.sd_weight_scale * cfg.beta)
    return base


def reconet_flow_like_outputs(cfg, frozen, outs1, outs2, img1, img2, flow, mask):
    """Candy-style loss block over precomputed (features, styled) pairs."""
    fmap1, s1 = outs1
    fmap2, s2 = outs2
    idx = (cfg.input_frame_num - 1) * 3
    s1n, s2n = t_vgg_normalize(s1), t_vgg_normalize(s2)
    i1n = t_vgg_normalize(img1[:, idx:idx + 3])
    i2n = t_vgg_normalize(img2[:, idx:idx + 3])
    taps = lambda x: list(t_vgg_features(frozen["vgg"], x, VGG16_CFG,
                                         VGG16_TAPS_RECONET).values())
    sf1, sf2, cf1, cf2 = taps(s1n), taps(s2n), taps(i1n), taps(i2n)
    total = 0.0
    if getattr(cfg, "use_ftl", True):
        total = t_reconet_ftl(fmap1, fmap2, flow, mask) * cfg.lambda_f
    total = total + t_reconet_otl(i1n, i2n, s1n, s2n, flow, mask) * cfg.lambda_o
    content = (F.mse_loss(sf1[2], cf1[2]) + F.mse_loss(sf2[2], cf2[2])) * cfg.alpha
    style = 0.0
    for f1, f2, gs in zip(sf1, sf2, frozen["grams"]):
        style = style + F.mse_loss(t_gram_chw(f1), gs.expand(f1.shape[0], -1, -1))
        style = style + F.mse_loss(t_gram_chw(f2), gs.expand(f2.shape[0], -1, -1))
    reg = (t_tv_sum(s1n) + t_tv_sum(s2n)) * cfg.gamma
    return total + content + style * cfg.beta + reg


def rtnstv_spatial_loss(cfg, frozen, cf, sf, styled):
    """RTNSTV/train.py:36-60 (content relu4_2, /(H·W) grams, sqrt-TV)."""
    content = F.mse_loss(cf["relu4_2"], sf["relu4_2"]) * cfg.alpha
    style = 0.0
    for gs, f in zip(frozen["grams"], sf.values()):
        style = style + F.mse_loss(t_gram_hw(f), gs.expand(f.shape[0], -1, -1))
    style = style * cfg.beta
    reg1 = torch.square(styled[:, :, :-1, 1:] - styled[:, :, :-1, :-1])
    reg2 = torch.square(styled[:, :, 1:, :-1] - styled[:, :, :-1, :-1])
    reg = torch.sqrt((reg1 + reg2).clamp(min=1e-8)).mean() * cfg.gamma
    return content + style + reg


def rtnstv_loss(cfg, params, frozen, batch):
    img1, img2, flow, mask = batch
    styled1 = t_rtnstv(params, img1)
    styled2 = t_rtnstv(params, img2)
    feats = lambda x: t_vgg_features(frozen["vgg"], t_vgg_normalize(x),
                                     VGG19_CFG, VGG19_TAPS_RTNSTV)
    cf1, cf2, sf1, sf2 = feats(img1), feats(img2), feats(styled1), feats(styled2)
    total = rtnstv_spatial_loss(cfg, frozen, cf1, sf1, styled1)
    total = total + rtnstv_spatial_loss(cfg, frozen, cf2, sf2, styled2)
    # temporal: mask-SUM normalization (+1e-8), RTNSTV/train.py:117-133
    cmask = mask.unsqueeze(1).expand(-1, 3, -1, -1)
    warped = t_warp(styled1, flow)
    tl = (cmask * torch.square(styled2 - warped)).sum() / (cmask.sum() + 1e-8)
    return total + tl * cfg.lam


def t_ada_feats(frozen, x255):
    """VGG19 relu*_1 taps with normalization inside (AdaAttN/vgg19.py:44)."""
    return t_vgg_features(frozen["vgg"], t_vgg_normalize(x255), VGG19_CFG,
                          VGG19_TAPS_ADAATTN)


def t_ada_gs_lf(cfg, params, frozen, fc, fs, fcs):
    """Global-stylized + local-feature losses (train_image.py:84-106)."""
    loss_gs = 0.0
    for tap in ("relu2_1", "relu3_1", "relu4_1", "relu5_1"):
        a, b = fcs[tap], fs[tap]
        loss_gs = (loss_gs + F.mse_loss(a.mean(dim=(2, 3)), b.mean(dim=(2, 3)))
                   + F.mse_loss(a.std(dim=(2, 3)), b.std(dim=(2, 3))))
    fcl, fsl = list(fc.values()), list(fs.values())
    loss_lf = 0.0
    for i in range(3):
        idx = i + 2
        c_1x = t_feature_down_sample(fcl, idx)
        s_1x = t_feature_down_sample(fsl, idx)
        target = t_adaattn_module(None, None, fcl[idx], fsl[idx], c_1x, s_1x,
                                  cfg.activation)
        loss_lf = loss_lf + F.mse_loss(fcs[f"relu{i + 3}_1"], target)
    return loss_gs * cfg.lambda_g, loss_lf * cfg.lambda_l


def adaattn_image_loss(cfg, params, frozen, batch):
    content, style = batch
    fc, fs = t_ada_feats(frozen, content), t_ada_feats(frozen, style)
    cs = t_adaattn_stylizer(params, fc, fs, cfg.activation)
    fcs = t_ada_feats(frozen, cs)
    gs, lf = t_ada_gs_lf(cfg, params, frozen, fc, fs, fcs)
    return gs + lf


def t_cosine_distance(x, y):
    """Channel-pair cosine distance with +1e-6 eps (AdaAttN/lossfn.py:25-38)."""
    b, c = x.shape[:2]
    u = x.reshape(b, c, -1)
    v = y.reshape(b, c, -1).permute(0, 2, 1)
    un = torch.linalg.vector_norm(u, dim=-1, keepdim=True)
    vn = torch.linalg.vector_norm(v, dim=1, keepdim=True)
    return 1 - torch.bmm(u, v) / (torch.bmm(un, vn) + 1e-6)


def adaattn_video_loss(cfg, params, frozen, batch):
    c1, c2, style = batch
    fc1, fc2 = t_ada_feats(frozen, c1), t_ada_feats(frozen, c2)
    fs = t_ada_feats(frozen, style)
    cs1 = t_adaattn_stylizer(params, fc1, fs, cfg.activation)
    cs2 = t_adaattn_stylizer(params, fc2, fs, cfg.activation)
    fcs1, fcs2 = t_ada_feats(frozen, cs1), t_ada_feats(frozen, cs2)
    gs, lf = t_ada_gs_lf(cfg, params, frozen, fc1, fs, fcs1)
    loss_is = 0.0
    for tap in ("relu2_1", "relu3_1", "relu4_1"):
        n = fc1[tap].shape[2] * fc1[tap].shape[3]
        d_c = t_cosine_distance(fc1[tap], fc2[tap])
        d_cs = t_cosine_distance(fcs1[tap], fcs2[tap])
        d_c = d_c / d_c.sum(dim=1, keepdim=True)
        d_cs = d_cs / d_cs.sum(dim=1, keepdim=True)
        loss_is = loss_is + torch.abs(d_c - d_cs).sum() / n
    return gs + lf + loss_is * cfg.lambda_is


# ------------------------------------------------------------- trajectory runner

def run_adam_trajectory(loss_fn, params0, batches, lr,
                        dtype=torch.float64):
    """N steps of ``loss.backward(); Adam(lr).step()`` from ``params0``.

    Matches the reference training loops' optimizer usage exactly
    (e.g. ReCoNet/train_single/train_candy.py:44-45,149-152: Adam with
    torch defaults b1=0.9 b2=0.999 eps=1e-8, zero_grad per step).

    Returns (per-step losses BEFORE the update, final params, step-0 grads).
    """
    keys = sorted(params0)
    leaves = {k: params0[k].detach().clone().to(dtype).requires_grad_(True)
              for k in keys}
    opt = torch.optim.Adam([leaves[k] for k in keys], lr=lr)
    losses, grads0 = [], None
    for batch in batches:
        batch = tuple(x.to(dtype) for x in batch)
        opt.zero_grad()
        loss = loss_fn(leaves, batch)
        loss.backward()
        if grads0 is None:
            grads0 = {k: leaves[k].grad.detach().clone() for k in keys}
        opt.step()
        losses.append(float(loss))
    return losses, {k: v.detach() for k, v in leaves.items()}, grads0
