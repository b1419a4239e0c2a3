"""End-to-end CLI smoke tests over synthetic data (tiny shapes, CPU)."""

import os

import numpy as np
import pytest
from PIL import Image

from vst_tpu.cli import evaluate as cli_eval
from vst_tpu.cli import infer_image as cli_infer_image
from vst_tpu.cli import train as cli_train
from tests.test_data import _make_sceneflow_scene, _write_img


def _png(path, rng, size=(32, 32)):
    arr = (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
    return path


class TestEvaluateCLI:
    @pytest.mark.parametrize("mode", ["ssim", "kl", "moment", "uni", "entropy"])
    def test_modes(self, tmp_path, rng, capsys, mode):
        p0 = _png(str(tmp_path / "a.png"), rng)
        p1 = _png(str(tmp_path / "b.png"), rng)
        cli_eval.main(["-m", mode, "-p0", p0, "-p1", p1])
        out = capsys.readouterr().out
        assert any(ch.isdigit() for ch in out)


class TestInferImageCLI:
    def test_rtnstv(self, tmp_path, rng, capsys):
        from vst_tpu.models import rtnstv
        from vst_tpu.train.checkpoint import save_params

        weights = str(tmp_path / "w.npz")
        save_params(rtnstv.init_stylizing_network(0), weights)
        content = _png(str(tmp_path / "c.png"), rng)
        out_dir = str(tmp_path / "out")
        cli_infer_image.main(["--model", "rtnstv", "--weights", weights,
                              "--content", content, "--out", out_dir])
        assert os.path.exists(os.path.join(out_dir, "stylized.png"))

    def test_reconet_pth_weights(self, tmp_path, rng):
        """CLI accepts reference-format .pth checkpoints directly."""
        from vst_tpu.models import reconet
        from vst_tpu.train.checkpoint import export_pth

        weights = str(tmp_path / "w.pth")
        export_pth(reconet.init_reconet(0), weights)
        content = _png(str(tmp_path / "c.png"), rng)
        out_dir = str(tmp_path / "out")
        cli_infer_image.main(["--model", "reconet", "--weights", weights,
                              "--content", content, "--out", out_dir])
        assert os.path.exists(os.path.join(out_dir, "stylized.png"))


class TestTrainCLI:
    def test_rtnstv_one_epoch(self, tmp_path, rng):
        root = str(tmp_path / "sceneflow")
        _make_sceneflow_scene(os.path.join(root, "monkaa"), rng, 5, "monkaa")
        _make_sceneflow_scene(os.path.join(root, "flyingthings3d"), rng, 5,
                              "ft3d")
        style = _png(str(tmp_path / "style.png"), rng)
        out_dir = str(tmp_path / "models")
        cli_train.main([
            "--trainer", "rtnstv", "--data", root, "--style", style,
            "--out-dir", out_dir, "--epochs", "1", "--batch-size", "2",
            "--img-size", "24", "32", "--log-every", "1",
        ])
        files = os.listdir(out_dir)
        assert any(f.endswith(".npz") for f in files)
        assert any(f.endswith(".pth") for f in files)
        assert any(f.endswith("_last_state.pkl") for f in files)

    def test_reconet_candy_one_epoch(self, tmp_path, rng):
        root = str(tmp_path / "sceneflow")
        _make_sceneflow_scene(os.path.join(root, "monkaa"), rng, 5, "monkaa")
        _make_sceneflow_scene(os.path.join(root, "flyingthings3d"), rng, 5,
                              "ft3d")
        style = _png(str(tmp_path / "style.png"), rng)
        out_dir = str(tmp_path / "models")
        cli_train.main([
            "--trainer", "reconet-candy", "--data", root, "--style", style,
            "--out-dir", out_dir, "--epochs", "1", "--batch-size", "2",
            "--img-size", "24", "32", "--log-every", "1",
        ])
        assert any(f.endswith(".pth") for f in os.listdir(out_dir))
