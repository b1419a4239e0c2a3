"""Guarded real-weight parity harness.

Turns BASELINE.md's "≤1% deviation in Et / LPIPS vs the PyTorch reference"
targets into checkable assertions the moment real weights exist:

- The reference's COMMITTED SD1/SD2 checkpoints
  (ReCoNet/models_old/SD{1,2}_epoch_4_batchSize_2.pth) always drive a real-
  checkpoint Et comparison: the full JAX eval pipeline vs a functional-torch
  re-derivation of RTNSTV/utilities.py:194-240 on the same weights.
- Pretrained torchvision trunks (absent in this zero-egress image) activate
  the LPIPS/Gram/SIFID comparisons when mounted; point the env vars at the
  downloaded .pth files:

      VST_VGG16_PTH      torchvision vgg16-397923af.pth
      VST_VGG19_PTH      torchvision vgg19-dcbb9e9d.pth
      VST_INCEPTION_PTH  torchvision inception_v3_google-*.pth

  (default search: ~/.cache/torch/hub/checkpoints/).  The LPIPS linear
  heads come from the reference's vendored lpips/weights/v0.1/vgg.pth.

Both sides of every comparison consume the SAME weight files, so the delta
measures implementation parity — the reference semantics in functional
torch vs the TPU-native JAX path — with no download needed beyond the
trunk itself.
"""

import glob
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests import torch_refs

RECONET_REF = ("/root/reference/Real-time-Coherent-Video-Style-Transfer-"
               "Network-(ReCoNet)")
SD1_PTH = f"{RECONET_REF}/models_old/SD1_epoch_4_batchSize_2.pth"
LPIPS_HEADS = ("/root/reference/Revisit-Attention-Mechanism-in-Arbitrary-"
               "Neural-Style-Transfer-(AdaAttN)/lpips/weights/v0.1/vgg.pth")


def _find_weight(env_var, pattern):
    path = os.environ.get(env_var)
    if path and os.path.exists(path):
        return path
    hits = glob.glob(os.path.expanduser(
        f"~/.cache/torch/hub/checkpoints/{pattern}"))
    return hits[0] if hits else None


VGG16_PTH = _find_weight("VST_VGG16_PTH", "vgg16-*.pth")
VGG19_PTH = _find_weight("VST_VGG19_PTH", "vgg19-*.pth")
INCEPTION_PTH = _find_weight("VST_INCEPTION_PTH", "inception_v3_*.pth")

TOL = 0.01  # the BASELINE.md ≤1% deviation target


def _clip(rng, n=4, h=48, w=64):
    """Synthetic clip: shifted noise frames + consistent flow/masks."""
    base = (rng.random((h, w + 2 * n, 3)) * 255).astype(np.float32)
    frames = [base[:, 2 * i:2 * i + w] for i in range(n)]
    flows = [np.tile(np.asarray([2.0, 0.0], np.float32), (h, w, 1))
             for _ in range(n - 1)]
    masks = [np.ones((h, w), np.float32) for _ in range(n - 1)]
    return frames, flows, masks


@pytest.mark.skipif(not os.path.exists(SD1_PTH),
                    reason="reference SD1 checkpoint not mounted")
class TestRealCheckpointEt:
    def test_et_sd1_within_1pct_of_torch_reference(self, rng):
        """Temporal error Et on the real SD1 checkpoint: JAX pipeline vs
        functional-torch reference semantics (RTNSTV/utilities.py:194-240)
        must agree within the 1% BASELINE target (expected ~1e-5)."""
        from vst_tpu.compat import jax_to_torch_arrays, load_pth
        from vst_tpu.eval.temporal import temporal_error_sintel
        from vst_tpu.models.reconet import reconet_sd1

        params = load_pth(SD1_PTH)
        frames, flows, masks = _clip(rng)

        def model_fn(x):
            # reference Et uses the RAW model output (no clamp,
            # RTNSTV/utilities.py:215-217)
            return reconet_sd1(params, jnp.asarray(x))[-1]

        ours = temporal_error_sintel(model_fn, frames, flows, masks)

        # --- reference side: functional torch on the same weights --------
        # exact RTNSTV/utilities.py:194-240 semantics: warp styled_{t+1} by
        # the GT flow, occlusion-masked element MSE .mean(), /n, sqrt
        state = {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in jax_to_torch_arrays(params).items()}

        def t_styled(f):
            x = torch.from_numpy(f.transpose(2, 0, 1))[None]
            return torch_refs.t_reconet_sd1(state, x)[-1]

        styled = [t_styled(f) for f in frames]
        err = 0.0
        for i, (flow, mask) in enumerate(zip(flows, masks)):
            warped = t_warp(styled[i + 1], torch.from_numpy(
                flow.transpose(2, 0, 1))[None])
            m = torch.from_numpy(mask)[None, None].expand(
                -1, 3, -1, -1)
            err += float((m * (styled[i] - warped) ** 2).mean())
        ref = float(np.sqrt(err / len(flows)))

        assert abs(ours - ref) <= TOL * max(abs(ref), 1e-9), (ours, ref)


SD2_PTH = f"{RECONET_REF}/models_old/SD2_epoch_4_batchSize_2.pth"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(SD2_PTH),
                    reason="reference SD2 checkpoint not mounted")
class TestRealSD2TemporalMSE:
    """The committed SD2 checkpoint through the FULL temporal-MSE metric
    path — ``cli/experiments.py mse`` (decode → resize → stylize →
    frame-delta MSE, ReCoNet/utilities.py:126-176) — on a deterministic
    synthetic clip, pinned as a golden (VERDICT r4 #7).  Together with the
    SD1 frame-exact e2e (test_reference_assets.py), BOTH committed real
    artifacts now gate regressions on the metric pipeline, not just frame
    equality."""

    GOLDEN = 6652.0109  # pinned from this image's cv2/JAX CPU run

    def test_cli_mse_on_synthetic_clip_matches_golden(self, tmp_path,
                                                      capsys):
        import cv2

        rng = np.random.default_rng(1234)
        # shifted smooth pattern at the CLI's fixed 640×360 eval size so
        # the decode path's resize is the identity
        w, h, n = 640, 360, 5
        base = (rng.random((h, w + 2 * n, 3)) * 255).astype(np.uint8)
        src = str(tmp_path / "clip.avi")
        vw = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 30,
                             (w, h))
        for i in range(n):
            vw.write(base[:, 2 * i:2 * i + w])
        vw.release()

        from vst_tpu.cli import experiments

        experiments.main(["mse", "--model", "sd2", "--weights", SD2_PTH,
                          "--video", src, "--platform", "cpu"])
        val = float(capsys.readouterr().out.strip().splitlines()[-1])
        assert val == pytest.approx(self.GOLDEN, rel=1e-3), val


def t_warp(x, flow):
    """Reference backward warp (ReCoNet/utilities.py:39-57):
    normalized grid + grid_sample(align_corners=False, zeros)."""
    import torch.nn.functional as F

    n, c, h, w = x.shape
    ys, xs = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32),
                            indexing="ij")
    gx = xs[None] + flow[:, 0]
    gy = ys[None] + flow[:, 1]
    gx = 2.0 * gx / max(w - 1, 1) - 1.0
    gy = 2.0 * gy / max(h - 1, 1) - 1.0
    grid = torch.stack([gx, gy], dim=-1)
    return F.grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                         align_corners=False)


@pytest.mark.skipif(VGG16_PTH is None or not os.path.exists(LPIPS_HEADS),
                    reason="pretrained vgg16 trunk not mounted "
                           "(set VST_VGG16_PTH)")
class TestRealLPIPS:
    def test_lpips_within_1pct(self, rng):
        """Real-trunk + vendored-head LPIPS: ours vs functional-torch
        lpips/lpips.py semantics on the same weights."""
        from vst_tpu.compat import load_pth
        from vst_tpu.eval.lpips import (LPIPS_VGG16_TAPS,
                                        image_to_lpips_input,
                                        load_linear_heads, lpips_vgg)
        from vst_tpu.models.vgg import VGG16_CFG, _layer_table

        params = {k: v for k, v in load_pth(VGG16_PTH).items()
                  if k.startswith("features.")}
        params.update(load_linear_heads(LPIPS_HEADS))

        a255 = (rng.random((32, 32, 3)) * 255).astype(np.float32)
        b255 = (rng.random((32, 32, 3)) * 255).astype(np.float32)
        ours = float(lpips_vgg(params,
                               jnp.asarray(image_to_lpips_input(a255)),
                               jnp.asarray(image_to_lpips_input(b255)))[0])

        import torch.nn.functional as F

        state = torch.load(VGG16_PTH, map_location="cpu", weights_only=True)
        heads = torch.load(LPIPS_HEADS, map_location="cpu",
                           weights_only=True)
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def trunk(x):
            feats = []
            for idx, kind, _, _ in _layer_table(VGG16_CFG):
                if idx > 29:
                    break
                if kind == "conv":
                    x = F.conv2d(x, state[f"features.{idx}.weight"],
                                 state[f"features.{idx}.bias"], padding=1)
                elif kind == "relu":
                    x = F.relu(x)
                else:
                    x = F.max_pool2d(x, 2, 2)
                if idx in LPIPS_VGG16_TAPS:
                    feats.append(x)
            return feats

        def im2tensor(img):
            return torch.from_numpy(
                (img / (255.0 / 2.0) - 1.0).transpose(2, 0, 1))[None]

        f0 = trunk((im2tensor(a255) - shift) / scale)
        f1 = trunk((im2tensor(b255) - shift) / scale)
        val = 0.0
        for k, (x, y) in enumerate(zip(f0, f1)):
            xn = x / (x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            yn = y / (y.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            res = F.conv2d((xn - yn) ** 2, heads[f"lin{k}.model.1.weight"])
            val = val + res.mean(dim=[2, 3])
        ref = float(val.flatten()[0])
        assert abs(ours - ref) <= TOL * max(abs(ref), 1e-9), (ours, ref)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(SD1_PTH),
                    reason="reference SD1 checkpoint not mounted")
class TestRealSD1TeacherDistillation:
    """SD2 distillation with the REAL trained SD1 teacher
    (ReCoNet/models_old/SD1_epoch_4_batchSize_2.pth), fixture data:
    the full train_Flow_SD2.py objective (train_Flow_SD2.py:157-162) runs
    in float64 against the functional-torch reference loop on identical
    weights and batches — a real-weight trajectory-parity proof that runs
    in this image (no download needed)."""

    def test_trajectory_matches_torch_1e4(self, rng):
        import dataclasses

        import jax

        from tests import torch_train_refs as T
        from tests.test_train_parity import (grad_mask, images, flow_mask,
                                             run_jax_trajectory, to_torch,
                                             torch_batch)
        from vst_tpu.compat import load_pth
        from vst_tpu.compat.torch_params import torch_to_jax_arrays
        from vst_tpu.models import reconet, vgg
        from vst_tpu.train import config as C
        from vst_tpu.train import steps
        from vst_tpu.train.state import create, make_optimizer

        jax.config.update("jax_enable_x64", True)
        try:
            f64 = lambda t: jax.tree.map(
                lambda x: np.asarray(x, np.float64), t)
            teacher = f64(load_pth(SD1_PTH))
            cfg = dataclasses.replace(C.DISTILL_SD2, img_size=(32, 40),
                                      dtype="float64")
            n_steps = 6
            vgg_params = f64(vgg.init_vgg16_reconet(7))
            grams = steps.reconet_style_grams(
                vgg_params, images(rng, 1, 32, 40).astype(np.float64))
            params0 = f64(reconet.init_reconet_sd2(7))
            batches = [(images(rng, 2, 32, 40), images(rng, 2, 32, 40))
                       + flow_mask(rng, 2, 32, 40) for _ in range(n_steps)]
            opt = make_optimizer(cfg.lr)
            step = steps.make_reconet_distill_step(cfg, vgg_params, grams,
                                                   teacher, opt)
            jl, jp = run_jax_trajectory(step, create(params0, opt), batches)
        finally:
            jax.config.update("jax_enable_x64", False)

        frozen = {"vgg": to_torch(vgg_params), "teacher": to_torch(teacher),
                  "grams": [torch.from_numpy(np.asarray(g)).double()
                            for g in grams]}
        tb = [torch_batch(b) for b in batches]
        tl, tp, g0 = T.run_adam_trajectory(
            lambda p, b: T.reconet_distill_loss(cfg, p, frozen, b),
            to_torch(params0), tb, cfg.lr)

        # VERDICT round-3 item 6 target: ≤1e-4 agreement (measured ~1e-6)
        np.testing.assert_allclose(jl, tl, rtol=1e-4)
        # final params, f64 vs f64, restricted to true-gradient keys (the
        # loss is invariant to IN-feeding conv biases; see
        # test_train_parity's module docstring)
        tpj = torch_to_jax_arrays(tp)
        for k in grad_mask(g0):
            move = np.linalg.norm(tpj[k] - np.asarray(params0[k]))
            err = np.linalg.norm(np.asarray(jp[k], np.float64) - tpj[k])
            assert err <= 1e-4 * (move + 1e-12), (k, err, move)


class TestRealLPIPSVendoredHeads:
    """LPIPS end-to-end with the reference's REAL calibrated v0.1 linear
    heads (AdaAttN/lpips/weights/v0.1/vgg.pth) over REAL reference
    style/content JPEGs — runs in this image.  The trunk is the seeded
    random VGG16 (the torchvision trunk needs a download); both sides
    consume identical weights so the delta is pure implementation parity,
    and the values are pinned as goldens."""

    # computed here, pinned: (content vs style) LPIPS for the first two
    # sorted contents/ × styles/ reference JPEGs at 64², seeded trunk
    GOLDEN = {
        "0.1": {
            ("Avril-Lavigne.jpg", "AlgarveFarm.jpg"): 0.2366046,
            ("Avril-Lavigne.jpg", "Another-colorful-world.jpg"): 0.1598965,
            ("Bair.jpg", "AlgarveFarm.jpg"): 0.2421109,
            ("Bair.jpg", "Another-colorful-world.jpg"): 0.2171691,
        },
        # the reference also vendors the v0.0 calibrated heads
        # (lpips/weights/v0.0/vgg.pth); v0.0 consumes the [-1, 1] inputs
        # with NO ScalingLayer (lpips/lpips.py:135)
        "0.0": {
            ("Avril-Lavigne.jpg", "AlgarveFarm.jpg"): 0.1132070,
            ("Avril-Lavigne.jpg", "Another-colorful-world.jpg"): 0.0775204,
            ("Bair.jpg", "AlgarveFarm.jpg"): 0.1004779,
            ("Bair.jpg", "Another-colorful-world.jpg"): 0.0950164,
        },
    }

    @staticmethod
    def _load_ref_jpeg(path, size=64):
        from PIL import Image

        img = Image.open(path).convert("RGB").resize((size, size),
                                                     Image.BILINEAR)
        return np.asarray(img, np.float32)

    @pytest.mark.skipif(not os.path.exists(LPIPS_HEADS),
                        reason="reference lpips heads not mounted")
    @pytest.mark.parametrize("version", ["0.1", "0.0"])
    def test_real_heads_real_jpegs_match_torch(self, version):
        import torch.nn.functional as F

        from vst_tpu.compat.torch_params import jax_to_torch_arrays
        from vst_tpu.eval.lpips import (LPIPS_VGG16_TAPS,
                                        image_to_lpips_input,
                                        load_linear_heads, lpips_distance,
                                        random_lpips_params)
        from vst_tpu.models.vgg import VGG16_CFG, _layer_table

        heads_path = LPIPS_HEADS.replace("/v0.1/", f"/v{version}/")
        params = random_lpips_params(0, "vgg")
        params.update(load_linear_heads(heads_path))  # REAL calibrated heads

        adaattn_ref = os.path.dirname(LPIPS_HEADS).split("/lpips/")[0]
        contents = sorted(glob.glob(f"{adaattn_ref}/contents/*.jpg"))[:2]
        styles = sorted(glob.glob(f"{adaattn_ref}/styles/*.jpg"))[:2]
        assert contents and styles

        # torch side: same trunk + heads, lpips/lpips.py semantics
        tstate = {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in jax_to_torch_arrays(
                      {k: np.asarray(v) for k, v in params.items()
                       if k.startswith("features.")}).items()}
        heads = torch.load(heads_path, map_location="cpu",
                           weights_only=True)
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def trunk(x):
            feats = []
            for idx, kind, _, _ in _layer_table(VGG16_CFG):
                if idx > LPIPS_VGG16_TAPS[-1]:
                    break
                if kind == "conv":
                    x = F.conv2d(x, tstate[f"features.{idx}.weight"],
                                 tstate[f"features.{idx}.bias"], padding=1)
                elif kind == "relu":
                    x = F.relu(x)
                else:
                    x = F.max_pool2d(x, 2, 2)
                if idx in LPIPS_VGG16_TAPS:
                    feats.append(x)
            return feats

        def t_lpips(a255, b255):
            def im2tensor(img):
                return torch.from_numpy(
                    (img / (255.0 / 2.0) - 1.0).transpose(2, 0, 1))[None]

            x0, x1 = im2tensor(a255), im2tensor(b255)
            if version == "0.1":  # v0.0 has no ScalingLayer
                x0 = (x0 - shift) / scale
                x1 = (x1 - shift) / scale
            f0 = trunk(x0)
            f1 = trunk(x1)
            val = 0.0
            for k, (x, y) in enumerate(zip(f0, f1)):
                xn = x / (x.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
                yn = y / (y.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
                res = F.conv2d((xn - yn) ** 2,
                               heads[f"lin{k}.model.1.weight"])
                val = val + res.mean(dim=[2, 3])
            return float(val.flatten()[0])

        computed = {}
        for cp in contents:
            for sp in styles:
                a = self._load_ref_jpeg(cp)
                b = self._load_ref_jpeg(sp)
                ours = float(lpips_distance(
                    params, jnp.asarray(image_to_lpips_input(a)),
                    jnp.asarray(image_to_lpips_input(b)), "vgg",
                    version=version)[0])
                ref = t_lpips(a, b)
                assert abs(ours - ref) <= 1e-4 * max(abs(ref), 1e-9), (
                    cp, sp, ours, ref)
                computed[(os.path.basename(cp), os.path.basename(sp))] = ours

        for key, golden in self.GOLDEN[version].items():
            if golden is not None:
                assert computed[key] == pytest.approx(golden, rel=2e-3), (
                    key, computed[key], golden)


@pytest.mark.skipif(INCEPTION_PTH is None,
                    reason="pretrained inception_v3 not mounted "
                           "(set VST_INCEPTION_PTH)")
class TestRealSIFID:
    def test_sifid_finite_and_symmetric_zero(self, rng):
        """Real-Inception SIFID sanity: zero on identical inputs, positive
        and finite on distinct ones (full-block torch parity is covered by
        test_sifid.py with weight-copied oracles; this pins the converted
        real checkpoint end-to-end)."""
        from vst_tpu.compat.torch_params import convert_inception_state
        from vst_tpu.eval.sifid import sifid

        params = convert_inception_state(
            torch.load(INCEPTION_PTH, map_location="cpu", weights_only=True))
        a = (rng.random((64, 64, 3)) * 255).astype(np.float32)
        b = (rng.random((64, 64, 3)) * 255).astype(np.float32)
        assert sifid(params, a, a, 64) == pytest.approx(0.0, abs=1e-4)
        d = sifid(params, a, b, 64)
        assert np.isfinite(d) and d > 0
