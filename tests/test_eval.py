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
