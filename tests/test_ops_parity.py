"""Golden-parity tests: vst_tpu.ops vs torch-CPU functional references.

The reference repo has no tests (SURVEY.md §4); its behavior is defined by the
numerics of torch ops.  Each test here evaluates the corresponding torch
functional op (torch CPU is available in the image) and checks our NHWC JAX op
against it within float32 tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from vst_tpu import ops

TOL = dict(rtol=2e-5, atol=2e-5)


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


class TestPadConvNorm:
    def test_reflection_pad(self, rng):
        x = rand(rng, 2, 9, 11, 3)
        ours = ops.reflection_pad2d(jnp.asarray(x), 4)
        ref = to_nhwc(F.pad(nchw(x), (4, 4, 4, 4), mode="reflect"))
        np.testing.assert_allclose(np.asarray(ours), ref, **TOL)

    @pytest.mark.parametrize("stride,k", [(1, 3), (2, 3), (1, 9), (2, 9)])
    def test_conv2d(self, rng, stride, k):
        x = rand(rng, 2, 20, 24, 5)
        w = rand(rng, k, k, 5, 7)  # HWIO
        b = rand(rng, 7)
        ours = ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride)
        w_t = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
        ref = to_nhwc(F.conv2d(nchw(x), w_t, torch.from_numpy(b), stride=stride))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)

    def test_conv_transpose2d(self, rng):
        x = rand(rng, 2, 10, 12, 6)
        # torch layout: (in, out, kh, kw)
        w_t = rand(rng, 6, 4, 3, 3)
        b = rand(rng, 4)
        ref = to_nhwc(
            F.conv_transpose2d(
                nchw(x), torch.from_numpy(w_t), torch.from_numpy(b),
                stride=2, padding=1, output_padding=1,
            )
        )
        # our layout: HWIO (I=in), spatially flipped
        w_j = w_t[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
        ours = ops.conv_transpose2d(
            jnp.asarray(x), jnp.asarray(w_j), jnp.asarray(b),
            stride=2, padding=1, output_padding=1,
        )
        assert ours.shape == ref.shape == (2, 20, 24, 4)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)

    def test_max_pool(self, rng):
        x = rand(rng, 2, 12, 14, 3)
        ours = ops.max_pool2d(jnp.asarray(x))
        ref = to_nhwc(F.max_pool2d(nchw(x), 2, 2))
        np.testing.assert_allclose(np.asarray(ours), ref, **TOL)

    @pytest.mark.parametrize("affine", [True, False])
    def test_instance_norm(self, rng, affine):
        x = rand(rng, 2, 8, 10, 4) * 5 + 3
        if affine:
            scale, bias = rand(rng, 4), rand(rng, 4)
            ref = to_nhwc(
                F.instance_norm(
                    nchw(x), weight=torch.from_numpy(scale),
                    bias=torch.from_numpy(bias), eps=1e-5,
                )
            )
            ours = ops.instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
        else:
            ref = to_nhwc(F.instance_norm(nchw(x), eps=1e-5))
            ours = ops.instance_norm(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


class TestResize:
    @pytest.mark.parametrize(
        "in_hw,out_hw",
        [((64, 64), (32, 32)), ((17, 23), (40, 31)), ((64, 128), (16, 32)),
         ((8, 8), (256, 256)), ((36, 40), (9, 10)),
         # exact-×2 cases dispatch to the 2-tap upsample_bilinear2x path
         ((16, 24), (32, 48)), ((1, 4), (2, 8)), ((3, 3), (6, 6))],
    )
    def test_bilinear_matches_torch(self, rng, in_hw, out_hw):
        x = rand(rng, 2, *in_hw, 3)
        ours = ops.resize_bilinear(jnp.asarray(x), out_hw)
        ref = to_nhwc(
            F.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=False)
        )
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)

    def test_nearest_upsample(self, rng):
        x = rand(rng, 2, 5, 7, 3)
        ours = ops.upsample_nearest(jnp.asarray(x), 2)
        ref = to_nhwc(F.interpolate(nchw(x), scale_factor=2))
        np.testing.assert_allclose(np.asarray(ours), ref, **TOL)


class TestWarp:
    def _torch_warp(self, x, flo, padding_mode="zeros"):
        """ReCoNet/utilities.py:39-57 semantics, re-derived in torch."""
        B, C, H, W = x.size()
        xx = torch.arange(0, W).view(1, -1).repeat(H, 1)
        yy = torch.arange(0, H).view(-1, 1).repeat(1, W)
        xx = xx.view(1, 1, H, W).repeat(B, 1, 1, 1)
        yy = yy.view(1, 1, H, W).repeat(B, 1, 1, 1)
        grid = torch.cat((xx, yy), 1).float()
        vgrid = grid + flo
        vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
        vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
        vgrid = vgrid.permute(0, 2, 3, 1)
        return F.grid_sample(
            x, vgrid, mode="bilinear", padding_mode=padding_mode, align_corners=False
        )

    @pytest.mark.parametrize("padding_mode", ["zeros", "border"])
    def test_warp(self, rng, padding_mode):
        x = rand(rng, 2, 24, 30, 3)
        flow = (rng.standard_normal((2, 24, 30, 2)) * 6).astype(np.float32)
        ours = ops.warp(jnp.asarray(x), jnp.asarray(flow), padding_mode)
        ref = to_nhwc(self._torch_warp(nchw(x), nchw(flow), padding_mode))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("padding_mode", ["zeros", "border"])
    @pytest.mark.parametrize("c", [3, 48])
    def test_packed_equals_percorner(self, rng, padding_mode, c, monkeypatch):
        """The corner-packed gather (C≤32 fast path) must be bit-identical
        to the per-corner formulation on the same inputs."""
        import importlib

        warp_mod = importlib.import_module("vst_tpu.ops.warp")
        x = rand(rng, 2, 20, 26, c)
        flow = (rng.standard_normal((2, 20, 26, 2)) * 8).astype(np.float32)
        monkeypatch.setattr(warp_mod, "_PACK_MAX_CHANNELS", 10**9)
        packed = np.asarray(ops.warp(jnp.asarray(x), jnp.asarray(flow),
                                     padding_mode))
        monkeypatch.setattr(warp_mod, "_PACK_MAX_CHANNELS", -1)
        percorner = np.asarray(ops.warp(jnp.asarray(x), jnp.asarray(flow),
                                        padding_mode))
        np.testing.assert_array_equal(packed, percorner)

    def test_grid_sample_extreme_coords(self, rng):
        x = rand(rng, 1, 16, 16, 2)
        grid_np = (rng.standard_normal((1, 10, 12, 2)) * 1.5).astype(np.float32)
        ours = ops.grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid_np))
        ref = to_nhwc(
            F.grid_sample(
                nchw(x), torch.from_numpy(grid_np), mode="bilinear",
                padding_mode="zeros", align_corners=False,
            )
        )
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("padding_mode", ["zeros", "border"])
    def test_grid_sample_grad_torch_parity(self, rng, padding_mode):
        """Custom VJP (sorted-splat dx + analytic dgrid) vs torch autograd."""
        import jax

        x = rand(rng, 2, 9, 11, 3)
        # non-integer, partly out-of-bounds coords (avoid the measure-zero
        # floor discontinuities where subgradient conventions differ)
        grid_np = (rng.standard_normal((2, 7, 8, 2)) * 0.9
                   + 0.013).astype(np.float32)
        cot = rng.standard_normal((2, 7, 8, 3)).astype(np.float32)

        def f(xx, gg):
            return jnp.sum(ops.grid_sample_bilinear(xx, gg, padding_mode)
                           * jnp.asarray(cot))

        dx, dgrid = jax.grad(f, argnums=(0, 1))(jnp.asarray(x),
                                                jnp.asarray(grid_np))

        xt = nchw(x).requires_grad_(True)
        gt = torch.from_numpy(grid_np).requires_grad_(True)
        out = F.grid_sample(xt, gt, mode="bilinear",
                            padding_mode=padding_mode, align_corners=False)
        out.backward(nchw(cot))
        np.testing.assert_allclose(np.asarray(dx), to_nhwc(xt.grad),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dgrid), gt.grad.numpy(),
                                   rtol=1e-3, atol=1e-3)

    def test_grid_sample_grad_x_oob_and_integer_coords(self, rng):
        """x-cotangent parity vs torch at the awkward spots: exact integer
        sample positions (a corner weight is 0 there) and far out-of-bounds
        corners (zeros-padding kills their contribution).  The grid
        cotangent is excluded: subgradient conventions at the measure-zero
        floor discontinuities legitimately differ."""
        import jax

        h, w = 8, 10
        x = rand(rng, 1, h, w, 2)
        gx = np.concatenate([
            rng.standard_normal(20) * 1.2,
            (2.0 * np.arange(5) / max(w - 1, 1) - 1.0),
            np.array([-3.0, 3.0, 1.0, -1.0, 0.5]),
        ]).astype(np.float32)
        gy = np.concatenate([
            rng.standard_normal(20) * 1.2,
            (2.0 * np.arange(5) / max(h - 1, 1) - 1.0),
            np.array([3.0, -3.0, -1.0, 1.0, 0.25]),
        ]).astype(np.float32)
        grid_np = np.stack([gx, gy], -1).reshape(1, 5, 6, 2)
        cot = rng.standard_normal((1, 5, 6, 2)).astype(np.float32)

        def f(xx):
            return jnp.sum(ops.grid_sample_bilinear(xx, jnp.asarray(grid_np))
                           * jnp.asarray(cot))

        dx = jax.grad(f)(jnp.asarray(x))

        xt = nchw(x).requires_grad_(True)
        out = F.grid_sample(xt, torch.from_numpy(grid_np), mode="bilinear",
                            padding_mode="zeros", align_corners=False)
        out.backward(nchw(cot))
        np.testing.assert_allclose(np.asarray(dx), to_nhwc(xt.grad),
                                   rtol=1e-4, atol=1e-5)

    def test_warp_grad_through_loss(self, rng):
        """End-to-end: grad of a masked temporal-style loss w.r.t. the
        warped tensor agrees with torch."""
        import jax

        x = rand(rng, 2, 12, 14, 3)
        flow = (rng.standard_normal((2, 12, 14, 2)) * 4).astype(np.float32)
        tgt = rand(rng, 2, 12, 14, 3)

        def loss(xx):
            return jnp.mean(
                jnp.square(ops.warp(xx, jnp.asarray(flow)) - jnp.asarray(tgt)))

        dx = jax.grad(loss)(jnp.asarray(x))

        xt = nchw(x).requires_grad_(True)
        warped = self._torch_warp(xt, nchw(flow))
        ref_loss = ((warped - nchw(tgt)) ** 2).mean()
        ref_loss.backward()
        np.testing.assert_allclose(np.asarray(dx), to_nhwc(xt.grad),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("threshold", [2.0, 5.0])
    def test_flow_warp_mask(self, rng, threshold):
        H, W = 20, 26
        f01 = (rng.standard_normal((H, W, 2)) * 3).astype(np.float32)
        f10 = (rng.standard_normal((H, W, 2)) * 3).astype(np.float32)
        ours = ops.flow_warp_mask(jnp.asarray(f01), jnp.asarray(f10), threshold=threshold)

        # torch reference re-derived from RTNSTV/utilities.py:80-110
        flo01 = nchw(f01[None]).clone()
        flo10 = nchw(f10[None]).clone()
        B, C, Ht, Wt = flo01.size()
        xx = torch.arange(0, Wt).view(1, -1).repeat(Ht, 1)
        yy = torch.arange(0, Ht).view(-1, 1).repeat(1, Wt)
        xx = xx.view(1, 1, Ht, Wt).repeat(B, 1, 1, 1)
        yy = yy.view(1, 1, Ht, Wt).repeat(B, 1, 1, 1)
        grid = torch.cat((xx, yy), 1).float()
        vgrid = grid + flo10
        target = grid + flo01
        vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(Wt - 1, 1) - 1.0
        vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(Ht - 1, 1) - 1.0
        vgrid = vgrid.permute(0, 2, 3, 1)
        flow_warp = F.grid_sample(
            target, vgrid, mode="bilinear", padding_mode="zeros", align_corners=False
        ).squeeze(0)
        err = torch.abs(flow_warp - grid.squeeze(0)).sum(dim=0)
        ref = (err < threshold).float().numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, **TOL)


class TestImageMath:
    def test_vgg_normalize(self, rng):
        x = (rng.random((2, 8, 8, 3)) * 255).astype(np.float32)
        ours = ops.vgg_normalize(jnp.asarray(x))
        t = nchw(x)
        mean = torch.tensor([0.485, 0.456, 0.406]).view(-1, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(-1, 1, 1)
        ref = to_nhwc(((t / 255.0 - mean) / std))
        np.testing.assert_allclose(np.asarray(ours), ref, **TOL)

    def test_gram_chw(self, rng):
        y = rand(rng, 2, 6, 7, 5)
        ours = ops.gram_matrix(jnp.asarray(y))
        t = nchw(y)
        b, ch, h, w = t.shape
        f = t.view(b, ch, h * w)
        ref = (f.bmm(f.transpose(1, 2)) / (ch * h * w)).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, **TOL)

    def test_gram_hw(self, rng):
        y = rand(rng, 2, 6, 7, 5)
        ours = ops.gram_matrix_hw(jnp.asarray(y))
        t = nchw(y)
        b, ch, h, w = t.shape
        f = t.view(b, ch, h * w)
        ref = (f.bmm(f.transpose(1, 2)) / (h * w)).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, **TOL)

    def test_luma(self, rng):
        x = rand(rng, 2, 4, 4, 3)
        ours = ops.rgb_to_luma709(jnp.asarray(x))
        t = nchw(x)
        ref = (0.2126 * t[:, 0] + 0.7152 * t[:, 1] + 0.0722 * t[:, 2]).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, **TOL)


class TestFeatureDownSample:
    def test_matches_torch(self, rng):
        feats_np = [
            rand(rng, 1, 64, 64, 4),
            rand(rng, 1, 32, 32, 6),
            rand(rng, 1, 16, 16, 8),
        ]
        ours = ops.feature_down_sample([jnp.asarray(f) for f in feats_np], 2)
        t_feats = [nchw(f) for f in feats_np]
        size = t_feats[2].shape[-2:]
        parts = [
            F.interpolate(t_feats[i], size=size, mode="bilinear", align_corners=False)
            for i in range(2)
        ] + [t_feats[2]]
        ref = to_nhwc(torch.cat(parts, dim=1))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


class TestPolyphaseConv:
    @pytest.mark.parametrize("cin,cout,hw", [(5, 3, (40, 48)), (3, 48, (24, 24)),
                                             (48, 3, (16, 40))])
    def test_matches_plain_conv(self, rng, cin, cout, hw):
        from vst_tpu.ops.conv import conv2d_polyphase

        x = jnp.asarray(rand(rng, 2, hw[0], hw[1], cin))
        w = jnp.asarray(rand(rng, 9, 9, cin, cout))
        b = jnp.asarray(rand(rng, cout))
        ref = ops.conv2d(x, w, b)
        out = conv2d_polyphase(x, w, b, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("cin,cout,hw", [(5, 3, (32, 48)),
                                             (3, 48, (24, 24)),
                                             (48, 3, (16, 40))])
    def test_reflect_variant_matches_pad_then_conv(self, rng, cin, cout, hw):
        """conv2d_polyphase_reflect == reflect-pad(4) + polyphase conv,
        exactly (the phase-shuffled border construction is a gather of the
        same values the full-tensor pad would produce)."""
        from vst_tpu.ops.conv import conv2d_polyphase, conv2d_polyphase_reflect

        x = jnp.asarray(rand(rng, 2, hw[0], hw[1], cin))
        w = jnp.asarray(rand(rng, 9, 9, cin, cout))
        b = jnp.asarray(rand(rng, cout))
        ref = conv2d_polyphase(ops.reflection_pad2d(x, 4), w, b, 4)
        out = conv2d_polyphase_reflect(x, w, b, 4)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestFusedConvVariants:
    def test_nearest_up2_matches_composition(self, rng):
        from vst_tpu.ops.conv import conv2d_nearest_up2

        x = jnp.asarray(rand(rng, 2, 12, 15, 6))
        w = jnp.asarray(rand(rng, 3, 3, 6, 4))
        b = jnp.asarray(rand(rng, 4))
        ref = ops.conv2d(
            ops.reflection_pad2d(ops.upsample_nearest(x, 2), 1), w, b)
        out = conv2d_nearest_up2(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_nearest_up2_2tap_matches_composition(self, rng):
        from vst_tpu.ops.conv import conv2d_nearest_up2_2tap

        for (h, w_, cin, cout) in [(12, 15, 6, 4), (9, 13, 3, 5)]:
            x = jnp.asarray(rand(rng, 2, h, w_, cin))
            w = jnp.asarray(rand(rng, 3, 3, cin, cout))
            b = jnp.asarray(rand(rng, cout))
            ref = ops.conv2d(
                ops.reflection_pad2d(ops.upsample_nearest(x, 2), 1), w, b)
            out = conv2d_nearest_up2_2tap(x, w, b)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)

    def test_k3s2_s2d_matches_strided_conv(self, rng):
        from vst_tpu.ops.conv import conv2d_k3s2_s2d

        x = jnp.asarray(rand(rng, 2, 34, 42, 5))
        w = jnp.asarray(rand(rng, 3, 3, 5, 7))
        b = jnp.asarray(rand(rng, 7))
        ref = ops.conv2d(x, w, b, stride=2)
        out = conv2d_k3s2_s2d(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestReflectConv:
    @pytest.mark.parametrize("hw,cin,cout", [((32, 40), 5, 7), ((24, 24), 48, 96)])
    def test_pad_free_matches_composition(self, rng, hw, cin, cout):
        from vst_tpu.ops.conv import conv2d_reflect1_k3s2

        x = jnp.asarray(rand(rng, 2, hw[0], hw[1], cin))
        w = jnp.asarray(rand(rng, 3, 3, cin, cout))
        b = jnp.asarray(rand(rng, cout))
        ref = ops.conv2d(ops.reflection_pad2d(x, 1), w, b, stride=2)
        out = conv2d_reflect1_k3s2(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("hw,cin,cout", [((32, 40), 5, 7),
                                             ((24, 24), 48, 96)])
    def test_dus_border_variant_bit_equal(self, rng, hw, cin, cout):
        """The dynamic-update-slice border formulation must be BIT-equal to
        the split-border one (same conv algebra, different stitching)."""
        from vst_tpu.ops.conv import (conv2d_reflect1_k3s2,
                                      conv2d_reflect1_k3s2_dus)

        x = jnp.asarray(rand(rng, 2, hw[0], hw[1], cin))
        w = jnp.asarray(rand(rng, 3, 3, cin, cout))
        b = jnp.asarray(rand(rng, cout))
        ref = conv2d_reflect1_k3s2(x, w, b)
        out = conv2d_reflect1_k3s2_dus(x, w, b)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    @pytest.mark.parametrize("hw", [(32, 40), (7, 9), (3, 3)])
    def test_s1_pad_free_matches_composition(self, rng, hw):
        from vst_tpu.ops.conv import conv2d_reflect1_k3s1

        x = jnp.asarray(rand(rng, 2, hw[0], hw[1], 5))
        w = jnp.asarray(rand(rng, 3, 3, 5, 7))
        b = jnp.asarray(rand(rng, 7))
        ref = ops.conv2d(ops.reflection_pad2d(x, 1), w, b, stride=1)
        out = conv2d_reflect1_k3s1(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


