"""E2E parity runs driven by the REFERENCE'S OWN binary assets.

Everything else in the suite uses procedural fixtures; these tests close
the loop on the north-star claim "reference checkpoints and style images
work unchanged" by driving the real committed artifacts through the CLIs:

- ReCoNet/models_old/SD1_epoch_4_batchSize_2.pth (the trained distilled
  student shipped by the reference) through cli/infer_video.py, comparing
  every output frame against the functional-torch oracle fed the SAME
  decoded frames (ReCoNet/inference/infer.py:10-21 semantics).
- ReCoNet/styles/candy.jpg through the style-gram precompute the trainers
  use (ReCoNet/train_single/train_candy.py:50-56).
- AdaAttN/styles/ + AdaAttN/contents/ JPEGs through
  cli/infer_image.py --all-pairs (AdaAttN/infer_image_all.py:18-57).

Skipped wholesale when /root/reference is not present (CI without the
reference snapshot).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REF = "/root/reference"
RECONET = os.path.join(
    REF, "Real-time-Coherent-Video-Style-Transfer-Network-(ReCoNet)")
ADAATTN = os.path.join(
    REF, "Revisit-Attention-Mechanism-in-Arbitrary-Neural-Style-Transfer-"
         "(AdaAttN)")
SD1 = os.path.join(RECONET, "models_old", "SD1_epoch_4_batchSize_2.pth")

if not os.path.isdir(REF):  # pragma: no cover
    pytestmark = [pytest.mark.slow,
                  pytest.mark.skip(reason="/root/reference not present")]


def _make_video(path, rng, n=6, size=(64, 48)):
    cv2 = pytest.importorskip("cv2")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, size)
    base = cv2.GaussianBlur(
        (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8), (5, 5), 1.5)
    for i in range(n):
        writer.write(np.roll(base, 3 * i, axis=1))
    writer.release()


class TestSD1CheckpointVideoCLI:
    def test_frame_parity_vs_torch_oracle(self, tmp_path, rng):
        """cli/infer_video.py + the committed SD1 .pth: every dumped frame
        must match the functional-torch SD1 forward on the SAME decoded
        frames (tolerance covers the two JPEG decoders' IDCT/chroma
        variance propagated through the net, plus the uint8 truncation)."""
        torch = pytest.importorskip("torch")
        from PIL import Image

        from vst_tpu.cli import infer_video as cli_iv
        from vst_tpu.infer.video import frames_from_source
        from tests.torch_refs import t_reconet_sd1

        video = str(tmp_path / "in.avi")
        _make_video(video, rng)
        frames_dir = str(tmp_path / "frames")
        cli_iv.main(["--model", "sd1", "--weights", SD1, "--video", video,
                     "--size", "64", "48", "--frames-dir", frames_dir,
                     "--frames-ext", "png", "--batch-size", "2",
                     "--platform", "cpu"])
        dumped = sorted(os.listdir(frames_dir))
        assert len(dumped) == 6

        state = torch.load(SD1, map_location="cpu", weights_only=True)
        # same frame source the CLI uses (native MJPG decoder when built,
        # else cv2) so the oracle sees IDENTICAL input pixels and the only
        # tolerance left is f32 forward noise at uint8 truncation edges
        for i, frame in enumerate(frames_from_source(video, (64, 48),
                                                     dtype="uint8")):
            x = torch.from_numpy(
                frame.transpose(2, 0, 1).astype(np.float32))[None]
            styled = t_reconet_sd1(state, x)[-1].clamp(0, 255)
            ref = styled[0].permute(1, 2, 0).numpy().astype(np.uint8)
            got = np.asarray(Image.open(os.path.join(frames_dir, dumped[i])))
            diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
            assert np.mean(diff) < 0.05 and diff.max() <= 1, (
                i, float(np.mean(diff)), int(diff.max()))


class TestReferenceStyleImages:
    def test_candy_style_grams(self):
        """ReCoNet/styles/candy.jpg through the trainer's gram precompute
        (train_candy.py:50-56) — real JPEG, reference resolution."""
        import jax.numpy as jnp

        from vst_tpu.data.datasets import load_image
        from vst_tpu.models import vgg
        from vst_tpu.train import steps

        style = load_image(os.path.join(RECONET, "styles", "candy.jpg"),
                           (640, 360))
        grams = steps.reconet_style_grams(vgg.init_vgg16_reconet(0),
                                          jnp.asarray(style[None]))
        assert [g.shape[-1] for g in grams] == [64, 128, 256, 512]
        assert all(np.isfinite(np.asarray(g)).all() for g in grams)

    def test_infer_image_all_pairs_reference_assets(self, tmp_path, rng):
        """cli/infer_image.py --all-pairs over real AdaAttN styles/contents
        (subset): the reference JPEGs drive the arbitrary-style path
        unchanged (AdaAttN/infer_image_all.py:18-57)."""
        import shutil

        from vst_tpu.cli import infer_image as cli_ii
        from vst_tpu.models import adaattn
        from vst_tpu.train.checkpoint import save_params

        styles = sorted(os.listdir(os.path.join(ADAATTN, "styles")))[:2]
        contents = sorted(os.listdir(os.path.join(ADAATTN, "contents")))[:2]
        sdir = tmp_path / "styles"
        cdir = tmp_path / "contents"
        sdir.mkdir()
        cdir.mkdir()
        for s in styles:
            shutil.copy(os.path.join(ADAATTN, "styles", s), sdir / s)
        for c in contents:
            shutil.copy(os.path.join(ADAATTN, "contents", c), cdir / c)
        weights = str(tmp_path / "ada.npz")
        save_params(adaattn.init_stylizing_network(0), weights)
        out = str(tmp_path / "results")
        cli_ii.main(["--model", "adaattn", "--weights", weights,
                     "--content", str(cdir), "--style", str(sdir),
                     "--all-pairs", "--size", "64", "64", "--out", out,
                     "--platform", "cpu"])
        produced = os.listdir(out)
        assert len(produced) == 4, produced
        from PIL import Image

        arr = np.asarray(Image.open(os.path.join(out, produced[0])))
        assert arr.shape[-1] == 3 and arr.size > 0
