"""Whole-train-step TRAJECTORY parity vs functional-torch autograd + Adam.

For every trainer family: identical random init + identical synthetic
batches → N steps of the reference training loop re-derived in torch f64
(tests/torch_train_refs.py: forward → loss → ``loss.backward()`` →
``torch.optim.Adam(lr).step()``, matching e.g.
ReCoNet/train_single/train_candy.py:151-152, RTNSTV/train.py:139-141,
AdaAttN/train_image.py:108-110, train_video.py:121-122) vs the jitted
vst_tpu step.  Asserts per-step losses agree and final params agree.

This closes the last big unverified surface: a gradient bug anywhere in the
VGG-through-warp chain, or an optax/torch Adam mismatch, would pass every
forward/loss-level test and still train to a different model — but cannot
pass a 6–10 step trajectory comparison.

Final-param comparison masks out params whose TRUE gradient is ~0 (conv
biases feeding affine-free InstanceNorm: the loss is mathematically
invariant to them, so both sides compute pure cancellation noise which Adam
normalizes into O(lr) random walks — divergence there is expected and
harmless).  The mask is derived from the torch-f64 step-0 gradients, not
hardcoded.  The divergence bound for the remaining params is calibrated by
a torch-f32 control trajectory (see assert_trajectory) so the test measures
"is jax-f32 within the noise any f32 implementation has", not an arbitrary
tolerance.
"""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier

import jax
import torch

from vst_tpu.compat.torch_params import jax_to_torch_arrays, torch_to_jax_arrays
from vst_tpu.models import adaattn, reconet, rtnstv, vgg
from vst_tpu.train import config as C
from vst_tpu.train import steps
from vst_tpu.train.state import create, make_optimizer
from tests import torch_train_refs as T

KEY = jax.random.PRNGKey(7)


def to_torch(params, dtype=torch.float64):
    return {k: torch.from_numpy(np.ascontiguousarray(v)).to(dtype)
            for k, v in jax_to_torch_arrays(params).items()}


def images(rng, n, h, w, c=3):
    return (rng.random((n, h, w, c)) * 255).astype(np.float32)


def flow_mask(rng, n, h, w):
    flow = (rng.standard_normal((n, h, w, 2)) * 2).astype(np.float32)
    mask = (rng.random((n, h, w)) > 0.2).astype(np.float32)
    return flow, mask


def nchw(x):
    return torch.from_numpy(
        np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2))).double()


def torch_batch(batch):
    out = []
    for x in batch:
        x = np.asarray(x)
        if x.ndim == 4:
            out.append(nchw(x))
        else:  # (N, H, W) mask
            out.append(torch.from_numpy(np.ascontiguousarray(x)).double())
    return tuple(out)


def run_jax_trajectory(step, state, batches):
    losses, final = [], None
    for batch in batches:
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    return losses, jax.tree.map(np.asarray, state.params)


def grad_mask(grads0, rel_threshold=1e-6):
    """Keys whose step-0 torch gradient is non-negligible (true-signal)."""
    rms = {k: float(torch.sqrt(torch.mean(g.double() ** 2)))
           for k, g in grads0.items()}
    gmax = max(rms.values())
    return {k for k, v in rms.items() if v > rel_threshold * gmax}


def assert_trajectory(jax_losses, t_losses, jax_params, t_params, grads0,
                      params0, t32_params=None, loss_rtol=2e-3,
                      rel_l2_floor=0.03, calib_factor=2.0):
    """Two checks:

    1. Per-step losses agree to ``loss_rtol`` — the sharp check: any
       gradient error compounds into the loss trajectory by step 2+.
    2. Final params agree in MOVEMENT-RELATIVE L2 per key, with the bound
       CALIBRATED by a torch-f32 control run: Adam's first updates are
       ±lr·sign(g) elementwise (v starts at 0), so elements whose true
       gradient is near zero flip sign between f32 and f64 and diverge by
       2·lr — pure precision noise, identical in kind for jax-f32 and
       torch-f32.  The bound per key is therefore
       max(floor, calib_factor · err(torch_f32 vs torch_f64)); a real
       gradient/optimizer bug shifts whole tensors and blows past any
       calibrated noise level.
    """
    np.testing.assert_allclose(jax_losses, t_losses, rtol=loss_rtol)
    mask = grad_mask(grads0)
    assert len(mask) >= len(t_params) // 2, (
        f"gradient mask suspiciously small: {len(mask)}/{len(t_params)}")
    t_jax_layout = torch_to_jax_arrays(t_params)
    t32_layout = (torch_to_jax_arrays(t32_params)
                  if t32_params is not None else None)
    bad = {}
    for k in mask:
        move = float(np.linalg.norm(t_jax_layout[k] - np.asarray(params0[k],
                                                                 np.float64)))
        err = float(np.linalg.norm(jax_params[k].astype(np.float64)
                                   - t_jax_layout[k])) / (move + 1e-12)
        bound = rel_l2_floor
        if t32_layout is not None:
            err32 = float(np.linalg.norm(
                t32_layout[k].astype(np.float64) - t_jax_layout[k]))
            bound = max(bound, calib_factor * err32 / (move + 1e-12))
        if err > bound:
            bad[k] = (err, bound)
    assert not bad, (
        f"params diverged beyond the calibrated f32 noise level: "
        f"{sorted(bad.items(), key=lambda kv: -kv[1][0])[:5]}")



def _cast_frozen(frozen, dtype):
    out = {}
    for k, v in frozen.items():
        if isinstance(v, dict):
            out[k] = {kk: x.to(dtype) for kk, x in v.items()}
        elif isinstance(v, list):
            out[k] = [x.to(dtype) for x in v]
        else:
            out[k] = v.to(dtype)
    return out


def run_torch_both(loss_for, frozen, params0_t, tbatches, lr):
    """f64 oracle trajectory + f32 noise-calibration trajectory."""
    tl, tp, g0 = T.run_adam_trajectory(loss_for(frozen), params0_t,
                                       tbatches, lr)
    _, tp32, _ = T.run_adam_trajectory(
        loss_for(_cast_frozen(frozen, torch.float32)), params0_t, tbatches,
        lr, dtype=torch.float32)
    return tl, tp, g0, tp32


# -------------------------------------------------------------------- families

class TestReCoNetTrajectories:
    def test_flow(self, rng):
        cfg = dataclasses.replace(C.RECONET_CANDY, img_size=(32, 40))
        n_steps, lr = 10, cfg.lr
        vgg_params = vgg.init_vgg16_reconet(KEY)
        style = images(rng, 1, 32, 40)
        grams = steps.reconet_style_grams(vgg_params, style)
        params0 = reconet.init_reconet(KEY)

        batches = [(images(rng, 2, 32, 40), images(rng, 2, 32, 40))
                   + flow_mask(rng, 2, 32, 40) for _ in range(n_steps)]

        opt = make_optimizer(lr)
        step = steps.make_reconet_flow_step(cfg, vgg_params, grams, opt)
        jl, jp = run_jax_trajectory(step, create(params0, opt), batches)

        frozen = {"vgg": to_torch(vgg_params),
                  "grams": [torch.from_numpy(np.asarray(g)).double()
                            for g in grams]}
        loss_for = lambda frozen: (
            lambda p, b: T.reconet_flow_loss(cfg, T.t_reconet, p, frozen, b))
        tbatches = [torch_batch(b) for b in batches]
        tl, tp, g0, tp32 = run_torch_both(loss_for, frozen,
                                          to_torch(params0), tbatches, lr)
        assert_trajectory(jl, tl, jp, tp, g0, params0, t32_params=tp32)

    def test_multiframe(self, rng):
        cfg = dataclasses.replace(C.RECONET_MULTIFRAME, img_size=(32, 40))
        n_steps, lr = 6, cfg.lr
        vgg_params = vgg.init_vgg16_reconet(KEY)
        grams = steps.reconet_style_grams(vgg_params, images(rng, 1, 32, 40))
        params0 = reconet.init_reconet(KEY, input_frame_num=4)
        batches = [(images(rng, 2, 32, 40, 12), images(rng, 2, 32, 40, 12))
                   + flow_mask(rng, 2, 32, 40) for _ in range(n_steps)]
        opt = make_optimizer(lr)
        step = steps.make_reconet_flow_step(cfg, vgg_params, grams, opt)
        jl, jp = run_jax_trajectory(step, create(params0, opt), batches)
        frozen = {"vgg": to_torch(vgg_params),
                  "grams": [torch.from_numpy(np.asarray(g)).double()
                            for g in grams]}
        loss_for = lambda frozen: (
            lambda p, b: T.reconet_flow_loss(cfg, T.t_reconet, p, frozen, b))
        tbatches = [torch_batch(b) for b in batches]
        tl, tp, g0, tp32 = run_torch_both(loss_for, frozen,
                                          to_torch(params0), tbatches, lr)
        assert_trajectory(jl, tl, jp, tp, g0, params0, t32_params=tp32)

    def test_coco(self, rng):
        cfg = dataclasses.replace(C.ReCoNetCocoConfig(), img_size=(32, 32))
        n_steps, lr = 10, cfg.lr
        vgg_params = vgg.init_vgg16_reconet(KEY)
        grams = steps.reconet_style_grams(vgg_params, images(rng, 1, 32, 32))
        params0 = reconet.init_reconet(KEY)
        batches = [(images(rng, 2, 32, 32),) for _ in range(n_steps)]
        opt = make_optimizer(lr)
        step = steps.make_reconet_coco_step(cfg, vgg_params, grams, opt)
        jl, jp = run_jax_trajectory(step, create(params0, opt),
                                    [b[0] for b in batches])
        frozen = {"vgg": to_torch(vgg_params),
                  "grams": [torch.from_numpy(np.asarray(g)).double()
                            for g in grams]}
        loss_for = lambda frozen: (
            lambda p, b: T.reconet_coco_loss(cfg, p, frozen, b))
        tbatches = [torch_batch(b) for b in batches]
        tl, tp, g0, tp32 = run_torch_both(loss_for, frozen,
                                          to_torch(params0), tbatches, lr)
        assert_trajectory(jl, tl, jp, tp, g0, params0, t32_params=tp32)

    def test_distill_sd2(self, rng):
        cfg = dataclasses.replace(C.DISTILL_SD2, img_size=(32, 40))
        n_steps, lr = 8, cfg.lr
        vgg_params = vgg.init_vgg16_reconet(KEY)
        grams = steps.reconet_style_grams(vgg_params, images(rng, 1, 32, 40))
        teacher = reconet.init_reconet_sd1(KEY)
        params0 = reconet.init_reconet_sd2(KEY)
        batches = [(images(rng, 2, 32, 40), images(rng, 2, 32, 40))
                   + flow_mask(rng, 2, 32, 40) for _ in range(n_steps)]
        opt = make_optimizer(lr)
        step = steps.make_reconet_distill_step(cfg, vgg_params, grams,
                                               teacher, opt)
        jl, jp = run_jax_trajectory(step, create(params0, opt), batches)
        frozen = {"vgg": to_torch(vgg_params),
                  "teacher": to_torch(teacher),
                  "grams": [torch.from_numpy(np.asarray(g)).double()
                            for g in grams]}
        loss_for = lambda frozen: (
            lambda p, b: T.reconet_distill_loss(cfg, p, frozen, b))
        tbatches = [torch_batch(b) for b in batches]
        tl, tp, g0, tp32 = run_torch_both(loss_for, frozen,
                                          to_torch(params0), tbatches, lr)
        assert_trajectory(jl, tl, jp, tp, g0, params0, t32_params=tp32)


    def test_distill_sd2_with_sd_term(self, rng):
        """include_sd_in_total=True: the teacher-MSE gradient path must
        track torch too (the reference computes-but-excludes the term,
        train_Flow_SD1.py:162; the opt-in is our documented extension)."""
        cfg = dataclasses.replace(C.DISTILL_SD2, img_size=(32, 40),
                                  include_sd_in_total=True)
        n_steps, lr = 6, cfg.lr
        vgg_params = vgg.init_vgg16_reconet(KEY)
        grams = steps.reconet_style_grams(vgg_params, images(rng, 1, 32, 40))
        teacher = reconet.init_reconet_sd1(KEY)
        params0 = reconet.init_reconet_sd2(KEY)
        batches = [(images(rng, 2, 32, 40), images(rng, 2, 32, 40))
                   + flow_mask(rng, 2, 32, 40) for _ in range(n_steps)]
        opt = make_optimizer(lr)
        step = steps.make_reconet_distill_step(cfg, vgg_params, grams,
                                               teacher, opt)
        jl, jp = run_jax_trajectory(step, create(params0, opt), batches)
        frozen = {"vgg": to_torch(vgg_params),
                  "teacher": to_torch(teacher),
                  "grams": [torch.from_numpy(np.asarray(g)).double()
                            for g in grams]}
        loss_for = lambda frozen: (
            lambda p, b: T.reconet_distill_loss(cfg, p, frozen, b))
        tbatches = [torch_batch(b) for b in batches]
        tl, tp, g0, tp32 = run_torch_both(loss_for, frozen,
                                          to_torch(params0), tbatches, lr)
        assert_trajectory(jl, tl, jp, tp, g0, params0, t32_params=tp32)


class TestRTNSTVTrajectory:
    def test_rtnstv(self, rng):
        cfg = dataclasses.replace(C.RTNSTVConfig(), img_size=(32, 40))
        n_steps, lr = 10, cfg.lr
        vgg_params = vgg.init_vgg19_rtnstv(KEY)
        grams = steps.rtnstv_style_grams(vgg_params, images(rng, 1, 32, 40))
        params0 = rtnstv.init_stylizing_network(KEY)
        batches = [(images(rng, 2, 32, 40), images(rng, 2, 32, 40))
                   + flow_mask(rng, 2, 32, 40) for _ in range(n_steps)]
        opt = make_optimizer(lr)
        step = steps.make_rtnstv_step(cfg, vgg_params, grams, opt)
        jl, jp = run_jax_trajectory(step, create(params0, opt), batches)
        frozen = {"vgg": to_torch(vgg_params),
                  "grams": [torch.from_numpy(np.asarray(g)).double()
                            for g in grams]}
        loss_for = lambda frozen: (
            lambda p, b: T.rtnstv_loss(cfg, p, frozen, b))
        tbatches = [torch_batch(b) for b in batches]
        tl, tp, g0, tp32 = run_torch_both(loss_for, frozen,
                                          to_torch(params0), tbatches, lr)
        assert_trajectory(jl, tl, jp, tp, g0, params0, t32_params=tp32)


class TestAdaAttNTrajectories:
    def test_image(self, rng):
        cfg = C.AdaAttNImageConfig(batch_size=2)
        n_steps, lr = 8, cfg.lr
        vgg_params = vgg.init_vgg19_adaattn(KEY)
        params0 = adaattn.init_stylizing_network(KEY)
        batches = [(images(rng, 2, 64, 64), images(rng, 2, 64, 64))
                   for _ in range(n_steps)]
        opt = make_optimizer(lr)
        step = steps.make_adaattn_image_step(cfg, vgg_params, opt)
        jl, jp = run_jax_trajectory(step, create(params0, opt), batches)
        frozen = {"vgg": to_torch(vgg_params)}
        loss_for = lambda frozen: (
            lambda p, b: T.adaattn_image_loss(cfg, p, frozen, b))
        tbatches = [torch_batch(b) for b in batches]
        tl, tp, g0, tp32 = run_torch_both(loss_for, frozen,
                                          to_torch(params0), tbatches, lr)
        assert_trajectory(jl, tl, jp, tp, g0, params0, t32_params=tp32)

    def test_video(self, rng):
        cfg = C.AdaAttNVideoConfig(batch_size=2)
        n_steps, lr = 6, cfg.lr
        vgg_params = vgg.init_vgg19_adaattn(KEY)
        params0 = adaattn.init_stylizing_network(KEY)
        batches = [(images(rng, 2, 64, 64), images(rng, 2, 64, 64),
                    images(rng, 2, 64, 64)) for _ in range(n_steps)]
        opt = make_optimizer(lr)
        step = steps.make_adaattn_video_step(cfg, vgg_params, opt)
        jl, jp = run_jax_trajectory(step, create(params0, opt), batches)
        frozen = {"vgg": to_torch(vgg_params)}
        loss_for = lambda frozen: (
            lambda p, b: T.adaattn_video_loss(cfg, p, frozen, b))
        tbatches = [torch_batch(b) for b in batches]
        tl, tp, g0, tp32 = run_torch_both(loss_for, frozen,
                                          to_torch(params0), tbatches, lr)
        assert_trajectory(jl, tl, jp, tp, g0, params0, t32_params=tp32)
