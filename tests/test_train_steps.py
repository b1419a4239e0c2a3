"""Smoke + sanity tests for every jitted train step (tiny shapes, CPU)."""

import dataclasses
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier

import numpy as np
import jax
import jax.numpy as jnp

from vst_tpu.models import adaattn, reconet, rtnstv, vgg
from vst_tpu.train import config as C
from vst_tpu.train import steps
from vst_tpu.train.state import TrainState, create, make_optimizer

KEY = jax.random.PRNGKey(0)


def image(rng, n, h, w, c=3):
    return jnp.asarray((rng.random((n, h, w, c)) * 255).astype(np.float32))


def flow_batch(rng, n, h, w):
    flow = jnp.asarray((rng.standard_normal((n, h, w, 2)) * 2).astype(np.float32))
    mask = jnp.asarray((rng.random((n, h, w)) > 0.2).astype(np.float32))
    return flow, mask


def params_changed(a, b):
    return any(not np.allclose(np.asarray(a[k]), np.asarray(b[k]))
               for k in a)


class TestReCoNetSteps:
    def test_flow_step(self, rng):
        cfg = dataclasses.replace(C.RECONET_CANDY, img_size=(32, 40))
        vgg_params = vgg.init_vgg16_reconet(KEY)
        style = image(rng, 1, 32, 40)
        grams = steps.reconet_style_grams(vgg_params, style)
        opt = make_optimizer(cfg.lr)
        state = create(reconet.init_reconet(KEY), opt)
        step = steps.make_reconet_flow_step(cfg, vgg_params, grams, opt)
        img1, img2 = image(rng, 2, 32, 40), image(rng, 2, 32, 40)
        flow, mask = flow_batch(rng, 2, 32, 40)
        p0 = jax.tree.map(np.asarray, state.params)
        state, m = step(state, (img1, img2, flow, mask))
        for k in ("FTL", "OTL", "CL", "SL", "RL", "loss"):
            assert np.isfinite(float(m[k])), k
        assert params_changed(p0, state.params)
        assert int(state.step) == 1

    def test_noftl_step_has_no_ftl(self, rng):
        cfg = dataclasses.replace(C.RECONET_NOFTL, img_size=(32, 40))
        vgg_params = vgg.init_vgg16_reconet(KEY)
        grams = steps.reconet_style_grams(vgg_params, image(rng, 1, 32, 40))
        opt = make_optimizer(cfg.lr)
        state = create(reconet.init_reconet(KEY), opt)
        step = steps.make_reconet_flow_step(cfg, vgg_params, grams, opt)
        img1, img2 = image(rng, 2, 32, 40), image(rng, 2, 32, 40)
        flow, mask = flow_batch(rng, 2, 32, 40)
        _, m = step(state, (img1, img2, flow, mask))
        assert "FTL" not in m

    def test_multiframe_step(self, rng):
        cfg = dataclasses.replace(C.RECONET_MULTIFRAME, img_size=(32, 40))
        vgg_params = vgg.init_vgg16_reconet(KEY)
        grams = steps.reconet_style_grams(vgg_params, image(rng, 1, 32, 40))
        opt = make_optimizer(cfg.lr)
        state = create(reconet.init_reconet(KEY, input_frame_num=4), opt)
        step = steps.make_reconet_flow_step(cfg, vgg_params, grams, opt)
        img1, img2 = image(rng, 2, 32, 40, 12), image(rng, 2, 32, 40, 12)
        flow, mask = flow_batch(rng, 2, 32, 40)
        _, m = step(state, (img1, img2, flow, mask))
        assert np.isfinite(float(m["loss"]))

    def test_coco_step(self, rng):
        cfg = dataclasses.replace(C.ReCoNetCocoConfig(), img_size=(32, 32))
        vgg_params = vgg.init_vgg16_reconet(KEY)
        grams = steps.reconet_style_grams(vgg_params, image(rng, 1, 32, 32))
        opt = make_optimizer(cfg.lr)
        state = create(reconet.init_reconet(KEY), opt)
        step = steps.make_reconet_coco_step(cfg, vgg_params, grams, opt)
        _, m = step(state, image(rng, 2, 32, 32))
        assert np.isfinite(float(m["loss"]))

    def test_distill_sd2_step_with_sd_loss(self, rng):
        """SD1→SD2 distillation: taps are shape-compatible, SDL finite."""
        cfg = dataclasses.replace(C.DISTILL_SD2, img_size=(32, 40))
        vgg_params = vgg.init_vgg16_reconet(KEY)
        grams = steps.reconet_style_grams(vgg_params, image(rng, 1, 32, 40))
        opt = make_optimizer(cfg.lr)
        teacher = reconet.init_reconet_sd1(KEY)
        state = create(reconet.init_reconet_sd2(KEY), opt)
        step = steps.make_reconet_distill_step(cfg, vgg_params, grams,
                                               teacher, opt)
        img1, img2 = image(rng, 2, 32, 40), image(rng, 2, 32, 40)
        flow, mask = flow_batch(rng, 2, 32, 40)
        _, m = step(state, (img1, img2, flow, mask))
        assert np.isfinite(float(m["SDL"]))
        assert np.isfinite(float(m["loss"]))

    def test_distill_sd1_mismatched_taps_reports_nan(self, rng):
        """ReCoNet→SD1: the reference pairing is 96ch vs 64ch (cannot
        broadcast in torch either) — SDL must surface as NaN, total finite."""
        cfg = dataclasses.replace(C.DISTILL_SD1, img_size=(32, 40))
        vgg_params = vgg.init_vgg16_reconet(KEY)
        grams = steps.reconet_style_grams(vgg_params, image(rng, 1, 32, 40))
        opt = make_optimizer(cfg.lr)
        teacher = reconet.init_reconet(KEY)
        state = create(reconet.init_reconet_sd1(KEY), opt)
        step = steps.make_reconet_distill_step(cfg, vgg_params, grams,
                                               teacher, opt)
        img1, img2 = image(rng, 2, 32, 40), image(rng, 2, 32, 40)
        flow, mask = flow_batch(rng, 2, 32, 40)
        _, m = step(state, (img1, img2, flow, mask))
        assert np.isnan(float(m["SDL"]))
        assert np.isfinite(float(m["loss"]))


class TestRTNSTVStep:
    def test_step(self, rng):
        cfg = dataclasses.replace(C.RTNSTVConfig(), img_size=(32, 40))
        vgg_params = vgg.init_vgg19_rtnstv(KEY)
        grams = steps.rtnstv_style_grams(vgg_params, image(rng, 1, 32, 40))
        opt = make_optimizer(cfg.lr)
        state = create(rtnstv.init_stylizing_network(KEY), opt)
        step = steps.make_rtnstv_step(cfg, vgg_params, grams, opt)
        img1, img2 = image(rng, 2, 32, 40), image(rng, 2, 32, 40)
        flow, mask = flow_batch(rng, 2, 32, 40)
        p0 = jax.tree.map(np.asarray, state.params)
        state, m = step(state, (img1, img2, flow, mask))
        for k in ("CL", "SL", "RL", "TL", "loss"):
            assert np.isfinite(float(m[k])), k
        assert params_changed(p0, state.params)


class TestAdaAttNSteps:
    def test_image_step(self, rng):
        cfg = C.AdaAttNImageConfig(batch_size=1)
        vgg_params = vgg.init_vgg19_adaattn(KEY)
        opt = make_optimizer(cfg.lr)
        state = create(adaattn.init_stylizing_network(KEY), opt)
        step = steps.make_adaattn_image_step(cfg, vgg_params, opt)
        content, style = image(rng, 1, 64, 64), image(rng, 1, 64, 64)
        p0 = jax.tree.map(np.asarray, state.params)
        state, m = step(state, (content, style))
        for k in ("loss_gs", "loss_lf", "loss"):
            assert np.isfinite(float(m[k])), k
        assert params_changed(p0, state.params)

    def test_video_step(self, rng):
        cfg = C.AdaAttNVideoConfig(batch_size=1)
        vgg_params = vgg.init_vgg19_adaattn(KEY)
        opt = make_optimizer(cfg.lr)
        state = create(adaattn.init_stylizing_network(KEY), opt)
        step = steps.make_adaattn_video_step(cfg, vgg_params, opt)
        c1, c2 = image(rng, 1, 64, 64), image(rng, 1, 64, 64)
        style = image(rng, 1, 64, 64)
        state, m = step(state, (c1, c2, style))
        for k in ("loss_gs", "loss_lf", "loss_is", "loss"):
            assert np.isfinite(float(m[k])), k


class TestLossDecreases:
    def test_rtnstv_loss_decreases_over_steps(self, rng):
        """Optimization sanity: repeated steps on one batch reduce the loss."""
        cfg = dataclasses.replace(C.RTNSTVConfig(), img_size=(32, 32))
        vgg_params = vgg.init_vgg19_rtnstv(KEY)
        grams = steps.rtnstv_style_grams(vgg_params, image(rng, 1, 32, 32))
        opt = make_optimizer(cfg.lr)
        state = create(rtnstv.init_stylizing_network(KEY), opt)
        step = steps.make_rtnstv_step(cfg, vgg_params, grams, opt)
        img1, img2 = image(rng, 1, 32, 32), image(rng, 1, 32, 32)
        flow, mask = flow_batch(rng, 1, 32, 32)
        batch = (img1, img2, flow, mask)
        losses_seen = []
        for _ in range(8):
            state, m = step(state, batch)
            losses_seen.append(float(m["loss"]))
        assert losses_seen[-1] < losses_seen[0]


class TestRemat:
    def test_remat_matches_no_remat(self, rng):
        """jax.checkpoint must not change the step's numerics."""
        cfg_a = dataclasses.replace(C.RECONET_CANDY, img_size=(24, 32))
        cfg_b = dataclasses.replace(cfg_a, remat=True)
        vgg_params = vgg.init_vgg16_reconet(KEY)
        grams = steps.reconet_style_grams(vgg_params, image(rng, 1, 24, 32))
        opt = make_optimizer(cfg_a.lr)
        img1, img2 = image(rng, 2, 24, 32), image(rng, 2, 24, 32)
        flow, mask = flow_batch(rng, 2, 24, 32)
        batch = (img1, img2, flow, mask)
        # Compare loss and raw gradients (post-Adam params amplify fp noise
        # to ±lr); remat must reproduce both.
        params = reconet.init_reconet(KEY)
        out = {}
        for name, cfg in (("plain", cfg_a), ("remat", cfg_b)):
            fwd = steps._maybe_remat(reconet.reconet, cfg)

            def loss_fn(p):
                _, f1, s1 = fwd(p, img1)
                _, f2, s2 = fwd(p, img2)
                total, _ = steps._reconet_losses(
                    cfg, vgg_params, grams, (f1, s1), (f2, s2),
                    img1, img2, flow, mask)
                return total

            loss, grads = jax.value_and_grad(loss_fn)(params)
            out[name] = (float(loss), grads)
        assert out["plain"][0] == pytest.approx(out["remat"][0], rel=1e-6)
        # Compare the GLOBAL gradient: per-param comparison is meaningless
        # for biases of convs feeding InstanceNorm (the loss is invariant to
        # them, so their exact gradient is 0 and the computed value is
        # cancellation noise at the reference's 1e12 loss scales).
        ga, gb = out["plain"][1], out["remat"][1]
        va = np.concatenate([np.asarray(ga[k], np.float64).ravel()
                             for k in sorted(ga)])
        vb = np.concatenate([np.asarray(gb[k], np.float64).ravel()
                             for k in sorted(gb)])
        rel = np.linalg.norm(va - vb) / np.linalg.norm(va)
        cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert rel < 1e-4 and cos > 0.999999, (rel, cos)

    def test_adaattn_video_remat_matches(self, rng):
        """cfg.remat on the AdaAttN steps (VGG + stylizer + no-conv target
        rematerialized) must not change the training numerics."""
        from vst_tpu.models import adaattn
        from vst_tpu.train.state import create

        cfg_a = dataclasses.replace(
            C.AdaAttNVideoConfig(), frame_size=(32, 32), batch_size=2,
            dtype="float32", attention_mode="exact")
        cfg_b = dataclasses.replace(cfg_a, remat=True)
        vgg_params = vgg.init_vgg19_adaattn(KEY)
        opt = make_optimizer(cfg_a.lr)
        batch = (image(rng, 2, 32, 32), image(rng, 2, 32, 32),
                 image(rng, 2, 32, 32))
        results = {}
        for name, cfg in (("plain", cfg_a), ("remat", cfg_b)):
            step = steps.make_adaattn_video_step(cfg, vgg_params, opt)
            state = create(adaattn.init_stylizing_network(KEY), opt)
            losses_seen = []
            for _ in range(3):
                state, m = step(state, batch)
                losses_seen.append(float(m["loss"]))
            results[name] = (losses_seen, state.params)
        for a, b in zip(results["plain"][0], results["remat"][0]):
            assert a == pytest.approx(b, rel=1e-5)
        # post-Adam params amplify fp recompute noise toward ±lr (same
        # caveat as the ReCoNet test above): bound drift loosely, trust
        # the per-step loss agreement (step 2/3 losses run through the
        # step-1/2 updated params, so gradient agreement is implied)
        pa, pb = results["plain"][1], results["remat"][1]
        va = np.concatenate([np.asarray(pa[k], np.float64).ravel()
                             for k in sorted(pa)])
        vb = np.concatenate([np.asarray(pb[k], np.float64).ravel()
                             for k in sorted(pb)])
        assert np.linalg.norm(va - vb) / np.linalg.norm(va) < 5e-3

