"""Eval-suite parity tests."""

import os

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.stats
import torch
import torch.nn.functional as F

from vst_tpu.eval import (
    average_entropy,
    compute_histogram,
    gram_loss_5tap,
    kl_divergence_rgb,
    nth_order_moment,
    ssim,
    temporal_error_sintel,
    temporal_mse,
    uniformity,
    warping_error_step,
)
from vst_tpu.eval.lpips import (
    LPIPS_CHANNELS,
    image_to_lpips_input,
    load_linear_heads,
    lpips_vgg,
    random_lpips_params,
)

LPIPS_WEIGHTS = ("/root/reference/Revisit-Attention-Mechanism-in-Arbitrary-"
                 "Neural-Style-Transfer-(AdaAttN)/lpips/weights/v0.1/vgg.pth")


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))


class TestSSIM:
    def _torch_ssim(self, a, b, window_size=11, sigma=1.5):
        """Re-derivation of AdaAttN/eval.py:167-223."""
        channel = a.shape[1]
        _1d = torch.linspace(-(window_size // 2), window_size // 2, window_size)
        gauss = torch.exp(-(_1d ** 2) / (2 * sigma ** 2))
        gauss = gauss / gauss.sum()
        _2d = gauss[:, None] @ gauss[None, :]
        kernel = _2d.expand(channel, 1, window_size, window_size).contiguous()
        pad = window_size // 2
        conv = lambda z: F.conv2d(z, kernel, padding=pad, groups=channel)
        mu1, mu2 = conv(a), conv(b)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = conv(a * a) - mu1_sq
        s2 = conv(b * b) - mu2_sq
        s12 = conv(a * b) - mu1_mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        num = (2 * mu1_mu2 + c1) * (2 * s12 + c2)
        den = (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
        return (num / den).mean(dim=[2, 3]).mean(dim=1).mean()

    def test_matches_torch(self, rng):
        a = (rng.random((2, 32, 40, 3)) * 255).astype(np.float32)
        b = (rng.random((2, 32, 40, 3)) * 255).astype(np.float32)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        ref = float(self._torch_ssim(nchw(a), nchw(b)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_identical_images(self, rng):
        a = (rng.random((1, 16, 16, 3))).astype(np.float32)
        assert float(ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0)


class TestHistogramMetrics:
    def test_kl_matches_scipy(self, rng):
        a = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
        b = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
        ours = kl_divergence_rgb(a, b)
        ref = 0.0
        for ch in range(3):
            ha = np.bincount(a[:, :, ch].flatten(), minlength=256) + 1
            hb = np.bincount(b[:, :, ch].flatten(), minlength=256) + 1
            ref += scipy.stats.entropy(ha, hb)
        np.testing.assert_allclose(ours, ref / 3.0, rtol=1e-6)

    def test_gray_stats(self, rng):
        g = (rng.random((24, 24)) * 255).astype(np.uint8)
        hist = compute_histogram(g)
        hist_p = hist / hist.sum()
        h = hist / 255.0
        ref_moment = float(np.sum(((h - h.mean()) ** 2) * hist_p))
        np.testing.assert_allclose(nth_order_moment(g), ref_moment, rtol=1e-6)
        np.testing.assert_allclose(uniformity(g), float((hist_p ** 2).sum()),
                                   rtol=1e-6)
        ref_ent = float(-(hist_p * np.log2(hist_p)).sum())
        np.testing.assert_allclose(average_entropy(g), ref_ent, rtol=1e-6)


class TestGram:
    def test_identical_is_zero(self, rng):
        from vst_tpu.models import vgg

        vp = vgg.init_vgg19_adaattn(3)
        img = jnp.asarray((rng.random((1, 32, 32, 3)) * 255).astype(np.float32))
        assert float(gram_loss_5tap(vp, img, img)) == pytest.approx(0.0, abs=1e-6)


class TestTemporalMetrics:
    def test_temporal_mse_identity_model(self, rng):
        frames = [(rng.random((8, 8, 3)) * 255).astype(np.float32)
                  for _ in range(5)]
        # identity stylizer → deltas equal → mse 0
        assert temporal_mse(lambda x: x, iter(frames)) == pytest.approx(0.0)

    def test_temporal_mse_constant_model(self, rng):
        frames = [(rng.random((8, 8, 3)) * 255).astype(np.float32)
                  for _ in range(4)]
        val = temporal_mse(lambda x: np.zeros_like(x), iter(frames))
        ref = np.mean([np.mean((frames[i + 1] - frames[i]) ** 2)
                       for i in range(3)])
        np.testing.assert_allclose(val, ref, rtol=1e-5)

    def test_et_zero_flow_identity(self, rng):
        """Zero flow + identity model → zero masked error away from the
        border (the reference's warp is only border-exact inside, due to its
        (dim-1)/align_corners=False normalization mix)."""
        frames = [np.full((8, 8, 3), 7.0, np.float32) for _ in range(3)]
        flows = [np.zeros((8, 8, 2), np.float32) for _ in range(2)]
        interior = np.zeros((8, 8), np.float32)
        interior[2:-2, 2:-2] = 1.0
        masks = [interior for _ in range(2)]
        val = temporal_error_sintel(lambda x: x, frames, flows, masks)
        assert val == pytest.approx(0.0, abs=1e-3)

    def test_warping_error_step_shapes(self, rng):
        cs1 = jnp.asarray((rng.random((1, 8, 8, 3)) * 255).astype(np.float32))
        cs2 = jnp.asarray((rng.random((1, 8, 8, 3)) * 255).astype(np.float32))
        flow = jnp.zeros((1, 8, 8, 2), jnp.float32)
        mask = jnp.ones((1, 8, 8), jnp.float32)
        from vst_tpu.data.flow_np import warp_np

        loss = float(warping_error_step(cs1, cs2, flow, mask))
        warped = warp_np(np.asarray(cs1)[0], np.asarray(flow)[0])
        ref = float(np.sum((np.asarray(cs2)[0] - warped) ** 2) / (3 * 8 * 8))
        np.testing.assert_allclose(loss, ref, rtol=1e-4)


class TestLPIPS:
    def _torch_lpips(self, params_t, a, b):
        """Functional re-derivation of lpips/lpips.py (net=vgg, eval mode)."""
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def trunk(x):
            feats = []
            layer_idx = 0
            from vst_tpu.models.vgg import VGG16_CFG, _layer_table
            for idx, kind, _, _ in _layer_table(VGG16_CFG):
                if idx > 29:
                    break
                if kind == "conv":
                    x = F.conv2d(x, params_t[f"features.{idx}.weight"],
                                 params_t[f"features.{idx}.bias"], padding=1)
                elif kind == "relu":
                    x = F.relu(x)
                else:
                    x = F.max_pool2d(x, 2, 2)
                if idx in (3, 8, 15, 22, 29):
                    feats.append(x)
            return feats

        f0 = trunk((a - shift) / scale)
        f1 = trunk((b - shift) / scale)
        val = 0.0
        for k, (x, y) in enumerate(zip(f0, f1)):
            xn = x / (x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            yn = y / (y.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            diff = (xn - yn) ** 2
            res = F.conv2d(diff, params_t[f"lin{k}.weight"])
            val = val + res.mean(dim=[2, 3], keepdim=True)
        return val.flatten()

    def test_matches_torch_oracle(self, rng):
        from vst_tpu.compat import jax_to_torch_arrays

        params = random_lpips_params(0)
        a = (rng.random((1, 32, 32, 3)) * 2 - 1).astype(np.float32)
        b = (rng.random((1, 32, 32, 3)) * 2 - 1).astype(np.float32)
        ours = np.asarray(lpips_vgg(params, jnp.asarray(a), jnp.asarray(b)))
        params_t = {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in jax_to_torch_arrays(params).items()}
        ref = self._torch_lpips(params_t, nchw(a), nchw(b)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_v00_skips_scaling_layer(self, rng):
        """version="0.0" consumes the [-1,1] inputs raw (lpips/lpips.py:135)."""
        from vst_tpu.eval.lpips import lpips_distance

        params = random_lpips_params(0)
        a = (rng.random((1, 32, 32, 3)) * 2 - 1).astype(np.float32)
        b = (rng.random((1, 32, 32, 3)) * 2 - 1).astype(np.float32)
        v01 = np.asarray(lpips_distance(params, jnp.asarray(a),
                                        jnp.asarray(b)))
        v00 = np.asarray(lpips_distance(params, jnp.asarray(a),
                                        jnp.asarray(b), version="0.0"))
        assert abs(float(v01[0]) - float(v00[0])) > 1e-7
        # v0.0 must equal v0.1 applied to pre-scaled inputs
        shift = np.array([-0.030, -0.088, -0.188], np.float32)
        scale = np.array([0.458, 0.448, 0.450], np.float32)
        pre_a = a * scale + shift
        pre_b = b * scale + shift
        ref = np.asarray(lpips_distance(params, jnp.asarray(pre_a),
                                        jnp.asarray(pre_b)))
        np.testing.assert_allclose(v00, ref, rtol=1e-4, atol=1e-6)

    def test_im2tensor(self):
        img = np.full((4, 4, 3), 255.0, np.float32)
        out = image_to_lpips_input(img)
        assert out.shape == (1, 4, 4, 3)
        np.testing.assert_allclose(out, 1.0)

    @pytest.mark.skipif(not os.path.exists(LPIPS_WEIGHTS),
                        reason="vendored LPIPS weights unavailable")
    def test_load_vendored_heads(self):
        heads = load_linear_heads(LPIPS_WEIGHTS)
        for k, c in enumerate(LPIPS_CHANNELS):
            assert heads[f"lin{k}.weight"].shape == (1, 1, c, 1)
            assert np.all(np.asarray(heads[f"lin{k}.weight"]) >= 0)


class TestFlowViz:
    def test_visualize_flow(self, rng):
        from vst_tpu.utils.flowviz import visualize_flow

        flow = (rng.standard_normal((12, 16, 2)) * 5).astype(np.float32)
        img = visualize_flow(flow)
        assert img.shape == (12, 16, 3)
        assert img.dtype == np.uint8
        # rightward flow (angle 0) maps to red-dominant hue
        right = np.zeros((4, 4, 2), np.float32)
        right[..., 0] = 5.0
        right[0, 0] = 0  # one zero pixel so min-max normalization spreads
        rgb = visualize_flow(right)
        assert rgb[2, 2, 0] > rgb[2, 2, 1] and rgb[2, 2, 0] > rgb[2, 2, 2]


class TestProfilingUtils:
    def test_step_timer(self):
        import time

        from vst_tpu.utils import StepTimer

        timer = StepTimer(warmup=1)
        for _ in range(4):
            with timer:
                time.sleep(0.01)
        s = timer.summary()
        assert s["steps"] == 3
        assert s["mean_s"] >= 0.01
        assert s["steps_per_sec"] > 0


class TestLPIPSNets:
    """alex/squeeze trunks + baseline mode vs functional-torch oracles
    (lpips/pretrained_networks.py slices)."""

    @staticmethod
    def _torch_alex_feats(p, x):
        def c(i, x, stride=1, padding=0):
            return F.relu(F.conv2d(x, p[f"features.{i}.weight"],
                                   p[f"features.{i}.bias"], stride=stride,
                                   padding=padding))
        out = []
        x = c(0, x, stride=4, padding=2); out.append(x)
        x = c(3, F.max_pool2d(x, 3, 2), padding=2); out.append(x)
        x = c(6, F.max_pool2d(x, 3, 2), padding=1); out.append(x)
        x = c(8, x, padding=1); out.append(x)
        x = c(10, x, padding=1); out.append(x)
        return out

    @staticmethod
    def _torch_squeeze_feats(p, x):
        def fire(i, x):
            s = F.relu(F.conv2d(x, p[f"features.{i}.squeeze.weight"],
                                p[f"features.{i}.squeeze.bias"]))
            e1 = F.relu(F.conv2d(s, p[f"features.{i}.expand1x1.weight"],
                                 p[f"features.{i}.expand1x1.bias"]))
            e3 = F.relu(F.conv2d(s, p[f"features.{i}.expand3x3.weight"],
                                 p[f"features.{i}.expand3x3.bias"],
                                 padding=1))
            return torch.cat([e1, e3], dim=1)

        def pool(x):
            return F.max_pool2d(x, 3, 2, ceil_mode=True)

        out = []
        x = F.relu(F.conv2d(x, p["features.0.weight"], p["features.0.bias"],
                            stride=2)); out.append(x)
        x = fire(4, fire(3, pool(x))); out.append(x)
        x = fire(7, fire(6, pool(x))); out.append(x)
        x = fire(9, pool(x)); out.append(x)
        x = fire(10, x); out.append(x)
        x = fire(11, x); out.append(x)
        x = fire(12, x); out.append(x)
        return out

    def _torch_lpips(self, params_t, a, b, feats_fn, n_taps, use_lpips=True):
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        f0 = feats_fn(params_t, (a - shift) / scale)
        f1 = feats_fn(params_t, (b - shift) / scale)
        val = 0.0
        for k, (x, y) in enumerate(zip(f0, f1)):
            xn = x / (x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            yn = y / (y.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            diff = (xn - yn) ** 2
            if use_lpips:
                res = F.conv2d(diff, params_t[f"lin{k}.weight"])
            else:
                res = diff.sum(dim=1, keepdim=True)
            val = val + res.mean(dim=[2, 3], keepdim=True)
        return val.flatten()

    @pytest.mark.parametrize("net,n_taps", [("alex", 5), ("squeeze", 7)])
    def test_matches_torch_oracle(self, rng, net, n_taps):
        from vst_tpu.compat import jax_to_torch_arrays
        from vst_tpu.eval.lpips import lpips_distance

        params = random_lpips_params(0, net)
        a = (rng.random((1, 64, 64, 3)) * 2 - 1).astype(np.float32)
        b = (rng.random((1, 64, 64, 3)) * 2 - 1).astype(np.float32)
        ours = np.asarray(lpips_distance(params, jnp.asarray(a),
                                         jnp.asarray(b), net))
        params_t = {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in jax_to_torch_arrays(params).items()}
        feats = (self._torch_alex_feats if net == "alex"
                 else self._torch_squeeze_feats)
        ref = self._torch_lpips(params_t, nchw(a), nchw(b), feats,
                                n_taps).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)

    def test_baseline_mode_matches_torch(self, rng):
        """use_lpips=False = the package's no-head "baseline" network."""
        from vst_tpu.compat import jax_to_torch_arrays
        from vst_tpu.eval.lpips import lpips_distance

        params = random_lpips_params(0, "alex")
        a = (rng.random((1, 64, 64, 3)) * 2 - 1).astype(np.float32)
        b = (rng.random((1, 64, 64, 3)) * 2 - 1).astype(np.float32)
        ours = np.asarray(lpips_distance(params, jnp.asarray(a),
                                         jnp.asarray(b), "alex", False))
        params_t = {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in jax_to_torch_arrays(params).items()}
        ref = self._torch_lpips(params_t, nchw(a), nchw(b),
                                self._torch_alex_feats, 5,
                                use_lpips=False).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


class TestFakeNetBaselines:
    """L2/DSSIM stand-in "networks" (lpips/lpips.py:241-280)."""

    def test_rgb2lab_known_values(self):
        from vst_tpu.eval.lpips import rgb2lab

        lab = rgb2lab(np.array([[[255, 255, 255]],
                                [[0, 0, 0]],
                                [[255, 0, 0]]], np.float64))
        np.testing.assert_allclose(lab[0, 0], [100, 0, 0], atol=0.01)
        np.testing.assert_allclose(lab[1, 0], [0, 0, 0], atol=0.01)
        np.testing.assert_allclose(lab[2, 0], [53.24, 80.09, 67.20],
                                   atol=0.05)

    def test_l2_rgb(self, rng):
        from vst_tpu.eval.lpips import l2_baseline

        a = (rng.random((8, 8, 3)) * 255)
        b = (rng.random((8, 8, 3)) * 255)
        ref = 0.5 * np.mean((a / 255.0 - b / 255.0) ** 2)
        np.testing.assert_allclose(l2_baseline(a, b, "RGB"), ref, rtol=1e-12)

    def test_l2_lab_nonnegative_zero_on_equal(self, rng):
        from vst_tpu.eval.lpips import l2_baseline

        a = (rng.random((8, 8, 3)) * 255)
        assert l2_baseline(a, a, "Lab") == 0.0
        assert l2_baseline(a, (rng.random((8, 8, 3)) * 255), "Lab") > 0

    def test_dssim_matches_torch_uniform_ssim(self, rng):
        """_ssim_uniform vs a torch avg_pool re-derivation of skimage's
        uniform-window sample-covariance SSIM."""
        from vst_tpu.eval.lpips import _ssim_uniform, dssim_baseline

        a = (rng.random((16, 16, 3)) * 255).astype(np.float64)
        b = np.clip(a + rng.standard_normal((16, 16, 3)) * 12, 0, 255)

        def torch_ssim(x, y, data_range, win=7):
            pad = (win - 1) // 2
            c1 = (0.01 * data_range) ** 2
            c2 = (0.03 * data_range) ** 2
            cov_norm = win * win / (win * win - 1.0)
            vals = []
            for ch in range(3):
                xt = torch.from_numpy(x[..., ch])[None, None]
                yt = torch.from_numpy(y[..., ch])[None, None]
                mu = lambda t: F.avg_pool2d(F.pad(t, (pad,) * 4,
                                                  mode="reflect"), win, 1)
                # skimage uniform_filter uses reflect; interior crop makes
                # the boundary handling irrelevant
                ux, uy = mu(xt), mu(yt)
                vx = cov_norm * (mu(xt * xt) - ux * ux)
                vy = cov_norm * (mu(yt * yt) - uy * uy)
                vxy = cov_norm * (mu(xt * yt) - ux * uy)
                s = ((2 * ux * uy + c1) * (2 * vxy + c2)
                     / ((ux * ux + uy * uy + c1) * (vx + vy + c2)))
                vals.append(s[0, 0, pad:-pad, pad:-pad].mean().item())
            return float(np.mean(vals))

        ours = _ssim_uniform(a, b, 255.0)
        ref = torch_ssim(a, b, 255.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-10)
        np.testing.assert_allclose(dssim_baseline(a, b, "RGB"),
                                   (1 - ref) / 2, rtol=1e-10)
        assert dssim_baseline(a, a, "Lab") == pytest.approx(0.0, abs=1e-12)


class TestLPIPSRankingTrainer:
    """BCE ranking calibration harness (lpips/trainer.py:14-143)."""

    def test_dist2logit_shapes_and_range(self, rng):
        from vst_tpu.eval.lpips_trainer import dist2logit, init_dist2logit

        p = init_dist2logit(0)
        d0 = jnp.asarray(rng.random(6).astype(np.float32))
        d1 = jnp.asarray(rng.random(6).astype(np.float32))
        out = np.asarray(dist2logit(p, d0, d1))
        assert out.shape == (6,)
        assert np.all((out > 0) & (out < 1))

    def test_training_decreases_loss_and_clamps_heads(self, rng):
        from vst_tpu.eval.lpips_trainer import (
            init_dist2logit, make_lpips_ranking_step)

        lp = random_lpips_params(0, "alex")
        init_state, step = make_lpips_ranking_step("alex", lr=1e-3)
        state = init_state(lp, init_dist2logit(1))
        ref = jnp.asarray((rng.random((2, 64, 64, 3)) * 2 - 1)
                          .astype(np.float32))
        p0 = jnp.asarray((rng.random((2, 64, 64, 3)) * 2 - 1)
                         .astype(np.float32))
        p1 = ref + 0.01 * jnp.asarray(
            rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        judge = jnp.asarray([1.0, 1.0], jnp.float32)  # p1 is closer

        losses = []
        for _ in range(5):
            state, m = step(state, ref, p0, p1, judge)
            losses.append(float(m["loss_total"]))
        assert losses[-1] < losses[0]
        for k, v in state["lpips"].items():
            if k.startswith("lin"):
                assert np.all(np.asarray(v) >= 0), k

    def test_accuracy_and_2afc(self):
        from vst_tpu.eval.lpips_trainer import compute_accuracy, score_2afc

        d0 = np.array([1.0, 0.2, 0.5])
        d1 = np.array([0.5, 0.8, 0.5])
        judge = np.array([1.0, 0.0, 1.0])  # human prefers p1, p0, p1
        # order agrees on first two; tie counts 0.5 in 2afc
        assert compute_accuracy(d0, d1, judge) == pytest.approx(2 / 3)
        assert score_2afc(d0, d1, judge) == pytest.approx((1 + 1 + 0.5) / 3)


class TestLPIPSSpatial:
    def test_spatial_map_matches_torch(self, rng):
        """spatial=True: per-layer maps upsampled (align_corners=False) to
        input size and summed (lpips/lpips.py:145-152)."""
        from vst_tpu.compat import jax_to_torch_arrays
        from vst_tpu.eval.lpips import lpips_distance

        params = random_lpips_params(0)
        a = (rng.random((1, 32, 32, 3)) * 2 - 1).astype(np.float32)
        b = (rng.random((1, 32, 32, 3)) * 2 - 1).astype(np.float32)
        ours = np.asarray(lpips_distance(params, jnp.asarray(a),
                                         jnp.asarray(b), "vgg",
                                         spatial=True))
        assert ours.shape == (1, 32, 32, 1)

        params_t = {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in jax_to_torch_arrays(params).items()}
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        from vst_tpu.models.vgg import VGG16_CFG, _layer_table

        def trunk(x):
            feats = []
            for idx, kind, _, _ in _layer_table(VGG16_CFG):
                if idx > 29:
                    break
                if kind == "conv":
                    x = F.conv2d(x, params_t[f"features.{idx}.weight"],
                                 params_t[f"features.{idx}.bias"], padding=1)
                elif kind == "relu":
                    x = F.relu(x)
                else:
                    x = F.max_pool2d(x, 2, 2)
                if idx in (3, 8, 15, 22, 29):
                    feats.append(x)
            return feats

        ta, tb = nchw(a), nchw(b)
        f0 = trunk((ta - shift) / scale)
        f1 = trunk((tb - shift) / scale)
        val = 0.0
        for k, (x, y) in enumerate(zip(f0, f1)):
            xn = x / (x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            yn = y / (y.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            res = F.conv2d((xn - yn) ** 2, params_t[f"lin{k}.weight"])
            val = val + torch.nn.functional.interpolate(
                res, size=(32, 32), mode="bilinear", align_corners=False)
        ref = val.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-6)

    def test_ret_per_layer(self, rng):
        from vst_tpu.eval.lpips import lpips_distance

        params = random_lpips_params(0)
        a = jnp.asarray((rng.random((1, 32, 32, 3)) * 2 - 1)
                        .astype(np.float32))
        b = jnp.asarray((rng.random((1, 32, 32, 3)) * 2 - 1)
                        .astype(np.float32))
        val, layers = lpips_distance(params, a, b, "vgg",
                                     ret_per_layer=True)
        assert len(layers) == 5
        np.testing.assert_allclose(np.asarray(val),
                                   np.sum([np.asarray(l) for l in layers],
                                          axis=0), rtol=1e-6)


class TestJNDScoring:
    def test_voc_ap_perfect_and_random(self):
        from vst_tpu.eval.lpips_trainer import score_jnd, voc_ap

        # perfect separation: all "same" pairs have the smallest distances
        ds = np.array([0.1, 0.2, 0.3, 0.9, 1.0, 1.1])
        sames = np.array([1, 1, 1, 0, 0, 0], np.float64)
        assert score_jnd(ds, sames) == pytest.approx(1.0)
        # inverted separation: the PR envelope bottoms out at the base
        # rate (precision 3/6 at full recall) → AP 0.5
        assert score_jnd(ds, 1 - sames) == pytest.approx(0.5)
        # voc_ap of a flat precision=1 curve is 1
        assert voc_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0])) \
            == pytest.approx(1.0)

    def test_jnd_matches_reference_formula(self, rng):
        """score_jnd vs a literal transcription of trainer.py:243-280."""
        from vst_tpu.eval.lpips_trainer import score_jnd, voc_ap

        ds = rng.random(50)
        sames = (rng.random(50) > 0.5).astype(np.float64)
        order = np.argsort(ds)
        ss = sames[order]
        tps = np.cumsum(ss)
        fps = np.cumsum(1 - ss)
        fns = np.sum(ss) - tps
        ref = voc_ap(tps / (tps + fns), tps / (tps + fps))
        assert score_jnd(ds, sames) == pytest.approx(ref)
