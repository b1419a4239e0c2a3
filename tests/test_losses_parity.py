"""Loss-level parity vs torch re-derivations of the reference loss blocks."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vst_tpu import losses
from vst_tpu.ops import vgg_normalize

TOL = dict(rtol=1e-4, atol=1e-4)


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))


def t_warp(x, flo):
    B, C, H, W = x.size()
    xx = torch.arange(0, W).view(1, -1).repeat(H, 1)
    yy = torch.arange(0, H).view(-1, 1).repeat(1, W)
    xx = xx.view(1, 1, H, W).repeat(B, 1, 1, 1)
    yy = yy.view(1, 1, H, W).repeat(B, 1, 1, 1)
    grid = torch.cat((xx, yy), 1).float()
    vgrid = grid + flo
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    return F.grid_sample(x, vgrid.permute(0, 2, 3, 1), mode="bilinear",
                         padding_mode="zeros", align_corners=False)


def feats(rng, n, h, w, c):
    return rng.standard_normal((n, h, w, c)).astype(np.float32)


class TestPerceptual:
    def test_reconet_style_loss(self, rng):
        taps = [feats(rng, 2, 16, 16, 8), feats(rng, 2, 8, 8, 12)]
        grams = []
        for f in [feats(rng, 1, 16, 16, 8), feats(rng, 1, 8, 8, 12)]:
            t = nchw(f)
            b, ch, h, w = t.shape
            fl = t.view(b, ch, h * w)
            grams.append((fl.bmm(fl.transpose(1, 2)) / (ch * h * w)).numpy())
        ours = losses.reconet_style_loss(
            [jnp.asarray(f) for f in taps], [jnp.asarray(g) for g in grams])
        ref = 0.0
        for f, g in zip(taps, grams):
            t = nchw(f)
            b, ch, h, w = t.shape
            fl = t.view(b, ch, h * w)
            gf = fl.bmm(fl.transpose(1, 2)) / (ch * h * w)
            ref += F.mse_loss(gf, torch.from_numpy(g).expand(b, -1, -1)).item()
        np.testing.assert_allclose(float(ours), ref, **TOL)

    def test_reconet_reg_loss(self, rng):
        styled = feats(rng, 2, 12, 14, 3)
        ours = losses.reconet_reg_loss(jnp.asarray(styled))
        s = nchw(styled)
        reg1 = torch.square(s[:, :, :-1, 1:] - s[:, :, :-1, :-1])
        reg2 = torch.square(s[:, :, 1:, :-1] - s[:, :, :-1, :-1])
        np.testing.assert_allclose(float(ours), torch.sum(reg1 + reg2).item(),
                                   rtol=1e-4, atol=1e-3)

    def test_rtnstv_spatial_loss(self, rng):
        names = ["relu1_2", "relu2_2", "relu3_2", "relu4_2"]
        chans = [8, 12, 16, 20]
        cf = {k: feats(rng, 2, 16, 16, c) for k, c in zip(names, chans)}
        sf = {k: feats(rng, 2, 16, 16, c) for k, c in zip(names, chans)}
        style_feats = {k: feats(rng, 1, 16, 16, c) for k, c in zip(names, chans)}
        styled = (rng.random((2, 32, 32, 3)) * 255).astype(np.float32)
        grams = []
        for k in names:
            t = nchw(style_feats[k])
            b, ch, h, w = t.shape
            fl = t.view(b, ch, h * w)
            grams.append((fl.bmm(fl.transpose(1, 2)) / (h * w)).numpy())
        a, b_, g = 1e7, 5e7, 5e-1
        cl, sl, rl = losses.rtnstv_spatial_loss(
            {k: jnp.asarray(v) for k, v in cf.items()},
            {k: jnp.asarray(v) for k, v in sf.items()},
            [jnp.asarray(x) for x in grams], jnp.asarray(styled), a, b_, g)

        # torch re-derivation of RTNSTV/train.py:36-60
        ref_cl = F.mse_loss(nchw(cf["relu4_2"]), nchw(sf["relu4_2"])) * a
        ref_sl = 0.0
        for gs, k in zip(grams, names):
            t = nchw(sf[k])
            bb, ch, h, w = t.shape
            fl = t.view(bb, ch, h * w)
            gf = fl.bmm(fl.transpose(1, 2)) / (h * w)
            ref_sl += F.mse_loss(gf, torch.from_numpy(gs).expand(bb, -1, -1))
        ref_sl = ref_sl * b_
        s = nchw(styled)
        reg1 = torch.square(s[:, :, :-1, 1:] - s[:, :, :-1, :-1])
        reg2 = torch.square(s[:, :, 1:, :-1] - s[:, :, :-1, :-1])
        ref_rl = torch.sqrt((reg1 + reg2).clamp(min=1e-8)).mean() * g
        np.testing.assert_allclose(float(cl), ref_cl.item(), rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(float(sl), ref_sl.item(), rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(float(rl), ref_rl.item(), **TOL)


class TestTemporal:
    def test_reconet_ftl(self, rng):
        f1 = feats(rng, 2, 8, 10, 6)
        f2 = feats(rng, 2, 8, 10, 6)
        flow = (rng.standard_normal((2, 32, 40, 2)) * 4).astype(np.float32)
        mask = (rng.random((2, 32, 40)) > 0.3).astype(np.float32)
        ours = losses.reconet_feature_temporal_loss(
            jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(flow), jnp.asarray(mask))

        # torch re-derivation of train_candy.py:91-106
        tf1, tf2 = nchw(f1), nchw(f2)
        tflow = nchw(flow)
        tmask = torch.from_numpy(mask)
        feature_flow = F.interpolate(tflow, size=tf1.shape[2:], mode="bilinear")
        feature_flow[:, 0] *= float(tf1.shape[3]) / tflow.shape[3]
        feature_flow[:, 1] *= float(tf1.shape[2]) / tflow.shape[2]
        warped = t_warp(tf1, feature_flow)
        fmask = F.interpolate(tmask.unsqueeze(1), size=tf1.shape[2:],
                              mode="bilinear").squeeze(1)
        fmask = (fmask > 0).float().unsqueeze(1).expand(-1, tf1.shape[1], -1, -1)
        loss = torch.sum(fmask * F.mse_loss(tf2, warped, reduction="none"))
        loss = loss / torch.nonzero(fmask).shape[0]
        np.testing.assert_allclose(float(ours), loss.item(), **TOL)

    def test_reconet_otl(self, rng):
        img1 = (rng.random((2, 16, 20, 3)) * 255).astype(np.float32)
        img2 = (rng.random((2, 16, 20, 3)) * 255).astype(np.float32)
        s1 = (rng.random((2, 16, 20, 3)) * 255).astype(np.float32)
        s2 = (rng.random((2, 16, 20, 3)) * 255).astype(np.float32)
        flow = (rng.standard_normal((2, 16, 20, 2)) * 3).astype(np.float32)
        mask = (rng.random((2, 16, 20)) > 0.3).astype(np.float32)

        i1n, i2n = vgg_normalize(jnp.asarray(img1)), vgg_normalize(jnp.asarray(img2))
        s1n, s2n = vgg_normalize(jnp.asarray(s1)), vgg_normalize(jnp.asarray(s2))
        ours = losses.reconet_output_temporal_loss(
            i1n, i2n, s1n, s2n, jnp.asarray(flow), jnp.asarray(mask))

        def tnorm(x):
            mean = torch.tensor([0.485, 0.456, 0.406]).view(-1, 1, 1)
            std = torch.tensor([0.229, 0.224, 0.225]).view(-1, 1, 1)
            return (x / 255.0 - mean) / std

        ti1, ti2 = tnorm(nchw(img1)), tnorm(nchw(img2))
        ts1, ts2 = tnorm(nchw(s1)), tnorm(nchw(s2))
        tflow, tmask = nchw(flow), torch.from_numpy(mask)
        warped_style = t_warp(ts1, tflow)
        warped_image = t_warp(ti1, tflow)
        output_term = ts2 - warped_style
        input_term = ti2 - warped_image
        input_term = (0.2126 * input_term[:, 0] + 0.7152 * input_term[:, 1]
                      + 0.0722 * input_term[:, 2])
        input_term = input_term.unsqueeze(1).expand(-1, 3, -1, -1)
        cmask = tmask.unsqueeze(1).expand(-1, 3, -1, -1)
        loss = torch.sum(cmask * F.mse_loss(output_term, input_term,
                                            reduction="none"))
        loss = loss / torch.nonzero(cmask).shape[0]
        np.testing.assert_allclose(float(ours), loss.item(), **TOL)

    def test_rtnstv_temporal(self, rng):
        s1 = (rng.random((2, 16, 20, 3)) * 255).astype(np.float32)
        s2 = (rng.random((2, 16, 20, 3)) * 255).astype(np.float32)
        flow = (rng.standard_normal((2, 16, 20, 2)) * 3).astype(np.float32)
        mask = (rng.random((2, 16, 20)) > 0.3).astype(np.float32)
        ours = losses.rtnstv_temporal_loss(
            jnp.asarray(s1), jnp.asarray(s2), jnp.asarray(flow), jnp.asarray(mask))
        ts1, ts2, tflow = nchw(s1), nchw(s2), nchw(flow)
        cmask = torch.from_numpy(mask).unsqueeze(1).expand(-1, 3, -1, -1)
        non_zero = cmask.sum() + 1e-8
        warped = t_warp(ts1, tflow)
        loss = (cmask * F.mse_loss(ts2, warped, reduction="none")).sum() / non_zero
        np.testing.assert_allclose(float(ours), loss.item(), **TOL)


class TestAdaAttNLosses:
    def test_global_stylized(self, rng):
        fcs = feats(rng, 2, 8, 10, 6)
        fs = feats(rng, 2, 8, 10, 6)
        ours = losses.global_stylized_loss(jnp.asarray(fcs), jnp.asarray(fs))
        a, b = nchw(fcs), nchw(fs)
        ref = (F.mse_loss(a.mean(dim=(2, 3)), b.mean(dim=(2, 3)))
               + F.mse_loss(a.std(dim=(2, 3)), b.std(dim=(2, 3))))
        np.testing.assert_allclose(float(ours), ref.item(), **TOL)

    def test_cosine_distance(self, rng):
        f1 = feats(rng, 2, 8, 10, 6)
        f2 = feats(rng, 2, 8, 10, 6)
        ours = losses.cosine_distance(jnp.asarray(f1), jnp.asarray(f2))
        a, b = nchw(f1), nchw(f2)
        bb, c, _, _ = a.size()
        u = a.reshape(bb, c, -1)
        v = b.reshape(bb, c, -1).permute(0, 2, 1)
        un = torch.linalg.vector_norm(u, dim=-1, keepdim=True)
        vn = torch.linalg.vector_norm(v, dim=1, keepdim=True)
        ref = 1 - torch.bmm(u, v) / (torch.bmm(un, vn) + 1e-6)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), **TOL)

    def test_image_similarity(self, rng):
        fc1 = feats(rng, 2, 8, 10, 6)
        fc2 = feats(rng, 2, 8, 10, 6)
        fcs1 = feats(rng, 2, 8, 10, 6)
        fcs2 = feats(rng, 2, 8, 10, 6)
        ours = losses.image_similarity_loss(
            *[jnp.asarray(x) for x in (fc1, fc2, fcs1, fcs2)])

        def t_cd(x, y):
            bb, c, _, _ = x.size()
            u = x.reshape(bb, c, -1)
            v = y.reshape(bb, c, -1).permute(0, 2, 1)
            un = torch.linalg.vector_norm(u, dim=-1, keepdim=True)
            vn = torch.linalg.vector_norm(v, dim=1, keepdim=True)
            return 1 - torch.bmm(u, v) / (torch.bmm(un, vn) + 1e-6)

        a, b, c_, d = nchw(fc1), nchw(fc2), nchw(fcs1), nchw(fcs2)
        n = a.shape[2] * a.shape[3]
        d1 = t_cd(a, b)
        d2 = t_cd(c_, d)
        d1 = d1 / d1.sum(dim=1, keepdim=True)
        d2 = d2 / d2.sum(dim=1, keepdim=True)
        ref = torch.abs(d1 - d2).sum() / n
        np.testing.assert_allclose(float(ours), ref.item(), **TOL)
