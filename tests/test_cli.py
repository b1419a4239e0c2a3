"""End-to-end CLI smoke tests over synthetic data (tiny shapes, CPU)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier
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
        assert os.path.isdir(os.path.join(out_dir, "rtnstv_last_state"))

    def test_preemption_exits_zero(self, tmp_path, rng, monkeypatch,
                                    capsys):
        """A TrainingPreempted from the loop must surface as a CLEAN exit
        (code 0) so supervisors distinguish preemption from failure."""
        from vst_tpu.train.loop import TrainingPreempted

        root = str(tmp_path / "sceneflow")
        _make_sceneflow_scene(os.path.join(root, "monkaa"), rng, 5, "monkaa")
        _make_sceneflow_scene(os.path.join(root, "flyingthings3d"), rng, 5,
                              "ft3d")
        style = _png(str(tmp_path / "style.png"), rng)

        def fake_run_training(*a, **k):
            raise TrainingPreempted("SIGTERM at epoch 1 batch 1", None)

        monkeypatch.setattr(cli_train, "run_training", fake_run_training)
        with pytest.raises(SystemExit) as exc:
            cli_train.main([
                "--trainer", "rtnstv", "--data", root, "--style", style,
                "--out-dir", str(tmp_path / "m"), "--epochs", "1",
                "--batch-size", "2", "--img-size", "24", "32",
            ])
        assert exc.value.code == 0
        assert "preempted" in capsys.readouterr().out

    def test_rtnstv_data_parallel(self, tmp_path, rng):
        """--data-parallel 8 on the virtual CPU mesh: batch sharded on the
        "data" axis, params replicated, checkpoints written from the
        sharded state (the conftest forces 8 host devices)."""
        root = str(tmp_path / "sceneflow")
        _make_sceneflow_scene(os.path.join(root, "monkaa"), rng, 9, "monkaa")
        _make_sceneflow_scene(os.path.join(root, "flyingthings3d"), rng, 9,
                              "ft3d")
        style = _png(str(tmp_path / "style.png"), rng)
        out_dir = str(tmp_path / "models")
        cli_train.main([
            "--trainer", "rtnstv", "--data", root, "--style", style,
            "--out-dir", out_dir, "--epochs", "1", "--batch-size", "8",
            "--img-size", "24", "32", "--log-every", "1",
            "--data-parallel", "8",
        ])
        files = os.listdir(out_dir)
        assert any(f.endswith(".npz") for f in files)
        assert os.path.isdir(os.path.join(out_dir, "rtnstv_last_state"))

    def test_data_parallel_batch_mismatch_exits(self, tmp_path, rng):
        root = str(tmp_path / "sceneflow")
        _make_sceneflow_scene(os.path.join(root, "monkaa"), rng, 5, "monkaa")
        _make_sceneflow_scene(os.path.join(root, "flyingthings3d"), rng, 5,
                              "ft3d")
        style = _png(str(tmp_path / "style.png"), rng)
        with pytest.raises(SystemExit, match="divisible"):
            cli_train.main([
                "--trainer", "rtnstv", "--data", root, "--style", style,
                "--out-dir", str(tmp_path / "m"), "--epochs", "1",
                "--batch-size", "3", "--img-size", "24", "32",
                "--data-parallel", "8",
            ])

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


class TestExperimentsCLI:
    def _make_sintel(self, root, rng, scene="alley_1", n=3, hw=(32, 64)):
        import vst_tpu.data.flowio as flowio

        h, w = hw
        fdir = os.path.join(root, "training/final", scene)
        odir = os.path.join(root, "training/flow", scene)
        mdir = os.path.join(root, "training/occlusions", scene)
        for d in (fdir, odir, mdir):
            os.makedirs(d, exist_ok=True)
        for i in range(n):
            _write_img(os.path.join(fdir, f"frame_{i:04d}.png"), rng, (w, h))
            if i < n - 1:
                flow = (rng.standard_normal((h, w, 2)) * 2).astype(np.float32)
                path = os.path.join(odir, f"frame_{i:04d}.flo")
                with open(path, "wb") as f:
                    np.float32(202021.25).tofile(f)
                    np.array([w, h], np.int32).tofile(f)
                    flow.tofile(f)
                occ = (rng.random((h, w)) > 0.8).astype(np.uint8) * 255
                Image.fromarray(occ).save(
                    os.path.join(mdir, f"frame_{i:04d}.png"))

    def test_sintel_et(self, tmp_path, rng, capsys):
        from vst_tpu.cli import experiments as cli_exp
        from vst_tpu.models import rtnstv
        from vst_tpu.train.checkpoint import save_params

        self._make_sintel(str(tmp_path / "sintel"), rng)
        weights = str(tmp_path / "w.npz")
        save_params(rtnstv.init_stylizing_network(0), weights)
        out = str(tmp_path / "et.csv")
        cli_exp.main(["sintel-et", "--weights", weights,
                      "--sintel", str(tmp_path / "sintel"),
                      "--scenes", "alley_1", "--out", out])
        assert os.path.exists(out)

    def test_sintel_ada_gt_flow(self, tmp_path, rng):
        from vst_tpu.cli import experiments as cli_exp
        from vst_tpu.models import adaattn
        from vst_tpu.train.checkpoint import save_params

        self._make_sintel(str(tmp_path / "sintel"), rng, hw=(64, 64))
        weights = str(tmp_path / "ada.npz")
        save_params(adaattn.init_stylizing_network(0), weights)
        style = _png(str(tmp_path / "style.png"), rng, (64, 64))
        out = str(tmp_path / "ada.csv")
        cli_exp.main(["sintel-ada", "--weights", weights, "--style", style,
                      "--sintel", str(tmp_path / "sintel"),
                      "--scenes", "alley_1", "--size", "64", "64",
                      "--out", out])
        assert os.path.exists(out)


class TestInferVideoCLI:
    def _make_video(self, path, rng, n=8, size=(64, 48)):
        import cv2

        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                                 size)
        for _ in range(n):
            frame = (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8)
            writer.write(frame)
        writer.release()

    def test_reconet_video(self, tmp_path, rng, capsys):
        from vst_tpu.cli import infer_video as cli_iv
        from vst_tpu.models import reconet
        from vst_tpu.train.checkpoint import save_params

        video = str(tmp_path / "in.avi")
        self._make_video(video, rng)
        weights = str(tmp_path / "w.npz")
        save_params(reconet.init_reconet(0), weights)
        out = str(tmp_path / "out.avi")
        cli_iv.main(["--model", "reconet", "--weights", weights,
                     "--video", video, "--size", "64", "48", "--out", out,
                     "--batch-size", "2"])
        assert os.path.exists(out)
        assert "fps" in capsys.readouterr().out

    def test_two_model_compare(self, tmp_path, rng):
        from vst_tpu.cli import infer_video as cli_iv
        from vst_tpu.models import reconet
        from vst_tpu.train.checkpoint import save_params

        video = str(tmp_path / "in.avi")
        self._make_video(video, rng, n=5)
        w1 = str(tmp_path / "w1.npz")
        w2 = str(tmp_path / "w2.npz")
        save_params(reconet.init_reconet(0), w1)
        save_params(reconet.init_reconet(1), w2)
        frames_dir = str(tmp_path / "frames")
        cli_iv.main(["--model", "reconet", "--weights", w1,
                     "--weights2", w2, "--video", video,
                     "--size", "64", "48", "--frames-dir", frames_dir])
        files = sorted(os.listdir(frames_dir))
        assert files
        from PIL import Image as PILImage

        img = PILImage.open(os.path.join(frames_dir, files[0]))
        assert img.size == (128, 48)  # side-by-side width doubled


    def test_data_parallel_matches_single_device(self, tmp_path, rng):
        """--data-parallel shards frame batches over the 8-device mesh;
        frames are independent, so output must be frame-identical to the
        single-device run."""
        from vst_tpu.cli import infer_video as cli_iv
        from vst_tpu.models import reconet
        from vst_tpu.train.checkpoint import save_params

        video = str(tmp_path / "in.avi")
        self._make_video(video, rng, n=10)
        weights = str(tmp_path / "w.npz")
        save_params(reconet.init_reconet(0), weights)
        d_single = str(tmp_path / "single")
        d_dp = str(tmp_path / "dp")
        base = ["--model", "reconet", "--weights", weights, "--video",
                video, "--size", "64", "48", "--batch-size", "8",
                "--frames-ext", "png"]
        cli_iv.main(base + ["--frames-dir", d_single])
        cli_iv.main(base + ["--frames-dir", d_dp, "--data-parallel"])
        singles = sorted(os.listdir(d_single))
        dps = sorted(os.listdir(d_dp))
        assert singles and singles == dps
        from PIL import Image as PILImage

        for name in singles:
            a = np.asarray(PILImage.open(os.path.join(d_single, name)))
            b = np.asarray(PILImage.open(os.path.join(d_dp, name)))
            np.testing.assert_array_equal(a, b)

    def test_data_parallel_batch_divisibility(self, tmp_path, rng, capsys):
        from vst_tpu.cli import infer_video as cli_iv
        from vst_tpu.models import reconet
        from vst_tpu.train.checkpoint import save_params

        video = str(tmp_path / "in.avi")
        self._make_video(video, rng, n=4)
        weights = str(tmp_path / "w.npz")
        save_params(reconet.init_reconet(0), weights)
        with pytest.raises(SystemExit, match="divisible"):
            cli_iv.main(["--model", "reconet", "--weights", weights,
                         "--video", video, "--size", "64", "48",
                         "--batch-size", "3", "--data-parallel"])

    def test_adaattn_video(self, tmp_path, rng):
        from vst_tpu.cli import infer_video as cli_iv
        from vst_tpu.models import adaattn
        from vst_tpu.train.checkpoint import save_params

        video = str(tmp_path / "in.avi")
        self._make_video(video, rng, n=4, size=(64, 64))
        weights = str(tmp_path / "ada.npz")
        save_params(adaattn.init_stylizing_network(0), weights)
        style = _png(str(tmp_path / "s.png"), rng, (64, 64))
        frames_dir = str(tmp_path / "frames")
        cli_iv.main(["--model", "adaattn", "--weights", weights,
                     "--style", style, "--video", video,
                     "--size", "64", "64", "--frames-dir", frames_dir,
                     "--batch-size", "2"])
        assert len(os.listdir(frames_dir)) == 4


    def test_adaattn_data_parallel_matches_single(self, tmp_path, rng):
        """--data-parallel with the AdaAttN stylizer: style state and
        params replicate, the frame batch shards — frame-identical to
        the single-device run."""
        from vst_tpu.cli import infer_video as cli_iv
        from vst_tpu.models import adaattn
        from vst_tpu.train.checkpoint import save_params

        video = str(tmp_path / "in.avi")
        self._make_video(video, rng, n=10, size=(64, 64))
        weights = str(tmp_path / "ada.npz")
        save_params(adaattn.init_stylizing_network(0), weights)
        style = _png(str(tmp_path / "s.png"), rng, (64, 64))
        d_single = str(tmp_path / "single")
        d_dp = str(tmp_path / "dp")
        base = ["--model", "adaattn", "--weights", weights, "--style",
                style, "--video", video, "--size", "64", "64",
                "--batch-size", "8", "--frames-ext", "png"]
        cli_iv.main(base + ["--frames-dir", d_single])
        cli_iv.main(base + ["--frames-dir", d_dp, "--data-parallel"])
        singles = sorted(os.listdir(d_single))
        assert singles and singles == sorted(os.listdir(d_dp))
        from PIL import Image as PILImage

        for name in singles:
            a = np.asarray(PILImage.open(os.path.join(d_single, name)))
            b = np.asarray(PILImage.open(os.path.join(d_dp, name)))
            np.testing.assert_array_equal(a, b)


class TestInferImageSampling:
    def test_adaattn_sample_from(self, tmp_path, rng):
        from vst_tpu.cli import infer_image as cli_ii
        from vst_tpu.models import adaattn
        from vst_tpu.train.checkpoint import save_params

        for d in ("coco", "wiki"):
            os.makedirs(str(tmp_path / d / "cls"), exist_ok=True)
            for i in range(2):
                _write_img(str(tmp_path / d / "cls" / f"{i}.jpg"), rng,
                           (64, 64))
        weights = str(tmp_path / "ada.npz")
        save_params(adaattn.init_stylizing_network(0), weights)
        out_dir = str(tmp_path / "out")
        cli_ii.main(["--model", "adaattn", "--weights", weights,
                     "--sample-from",
                     f"{tmp_path / 'coco'},{tmp_path / 'wiki'}",
                     "--out", out_dir])
        for name in ("content", "style", "stylized"):
            assert os.path.exists(os.path.join(out_dir, f"{name}.png"))


class TestRaftFlowEngine:
    def test_sintel_ada_raft(self, tmp_path, rng):
        from vst_tpu.cli import experiments as cli_exp
        from vst_tpu.models import adaattn
        from vst_tpu.models.raft import init_raft
        from vst_tpu.train.checkpoint import save_params

        TestExperimentsCLI()._make_sintel(str(tmp_path / "sintel"), rng,
                                          n=2, hw=(64, 64))
        weights = str(tmp_path / "ada.npz")
        save_params(adaattn.init_stylizing_network(0), weights)
        raft_w = str(tmp_path / "raft.npz")
        save_params(init_raft(0), raft_w)
        style = _png(str(tmp_path / "style.png"), rng, (64, 64))
        out = str(tmp_path / "ada_raft.csv")
        cli_exp.main(["sintel-ada", "--weights", weights, "--style", style,
                      "--sintel", str(tmp_path / "sintel"),
                      "--scenes", "alley_1", "--size", "64", "64",
                      "--flow-engine", "raft", "--raft-weights", raft_w,
                      "--out", out])
        assert os.path.exists(out)


def _load_rtnstv_state(path):
    """Orbax restores against a template of the right tree structure."""
    from vst_tpu.models import rtnstv
    from vst_tpu.train.checkpoint import load_state
    from vst_tpu.train.state import create, make_optimizer

    like = create(rtnstv.init_stylizing_network(0), make_optimizer(1e-3))
    return load_state(path, like=like)


class TestTrainResume:
    def test_resume_from_state(self, tmp_path, rng):
        from vst_tpu.cli import train as cli_train2

        root = str(tmp_path / "sceneflow")
        _make_sceneflow_scene(os.path.join(root, "monkaa"), rng, 5, "monkaa")
        _make_sceneflow_scene(os.path.join(root, "flyingthings3d"), rng, 5,
                              "ft3d")
        style = _png(str(tmp_path / "style.png"), rng)
        out_dir = str(tmp_path / "models")
        common = ["--trainer", "rtnstv", "--data", root, "--style", style,
                  "--out-dir", out_dir, "--batch-size", "2",
                  "--img-size", "24", "32", "--log-every", "0"]
        cli_train2.main(common + ["--epochs", "1"])
        state_path = os.path.join(out_dir, "rtnstv_last_state")
        assert os.path.isdir(state_path)  # orbax directory (default format)
        # resume into epoch 2
        cli_train2.main(common + ["--epochs", "2", "--epoch-start", "2",
                                  "--resume", state_path])
        assert os.path.exists(os.path.join(
            out_dir, "rtnstv_epoch_2_batchSize_2.npz"))

        final = _load_rtnstv_state(state_path)
        assert int(final.step) == 8  # 2 epochs x 4 batches

    def test_auto_resume(self, tmp_path, rng, capsys):
        """--resume auto: idempotent restart-after-crash — fresh start when
        no state exists, pick up at the derived epoch when it does."""
        from vst_tpu.cli import train as cli_train2

        root = str(tmp_path / "sceneflow")
        _make_sceneflow_scene(os.path.join(root, "monkaa"), rng, 5, "monkaa")
        _make_sceneflow_scene(os.path.join(root, "flyingthings3d"), rng, 5,
                              "ft3d")
        style = _png(str(tmp_path / "style.png"), rng)
        out_dir = str(tmp_path / "models")
        common = ["--trainer", "rtnstv", "--data", root, "--style", style,
                  "--out-dir", out_dir, "--batch-size", "2",
                  "--img-size", "24", "32", "--log-every", "0",
                  "--resume", "auto"]
        # no state yet → fresh start
        cli_train2.main(common + ["--epochs", "1"])
        assert "starting fresh" in capsys.readouterr().out
        # state exists → resumes into epoch 2 with no --epoch-start
        cli_train2.main(common + ["--epochs", "2"])
        out = capsys.readouterr().out
        assert "auto-resume: step 4 → epoch 2" in out
        assert os.path.exists(os.path.join(
            out_dir, "rtnstv_epoch_2_batchSize_2.npz"))

        final = _load_rtnstv_state(os.path.join(out_dir,
                                                "rtnstv_last_state"))
        assert int(final.step) == 8

    def test_auto_resume_finds_pickle_fallback_file(self, tmp_path, rng,
                                                    capsys):
        """When orbax is unavailable, save_state writes a bare pickle FILE
        at the *_last_state path; --resume auto must discover it (not
        'start fresh' and silently lose the run's progress)."""
        import shutil

        from vst_tpu.cli import train as cli_train2
        from vst_tpu.train.checkpoint import save_state

        root = str(tmp_path / "sceneflow")
        _make_sceneflow_scene(os.path.join(root, "monkaa"), rng, 5, "monkaa")
        _make_sceneflow_scene(os.path.join(root, "flyingthings3d"), rng, 5,
                              "ft3d")
        style = _png(str(tmp_path / "style.png"), rng)
        out_dir = str(tmp_path / "models")
        common = ["--trainer", "rtnstv", "--data", root, "--style", style,
                  "--out-dir", out_dir, "--batch-size", "2",
                  "--img-size", "24", "32", "--log-every", "0",
                  "--resume", "auto"]
        cli_train2.main(common + ["--epochs", "1"])
        capsys.readouterr()
        # rewrite the orbax state dir as the pickle-fallback bare file
        state_path = os.path.join(out_dir, "rtnstv_last_state")
        state = _load_rtnstv_state(state_path)
        shutil.rmtree(state_path)
        save_state(state, state_path, format="pickle")
        assert os.path.isfile(state_path)

        cli_train2.main(common + ["--epochs", "2"])
        out = capsys.readouterr().out
        assert "starting fresh" not in out
        assert "auto-resume: step 4 → epoch 2" in out


class TestExperimentsImageCSV:
    """exps_image.py mirror: CSV schema + average row
    (AdaAttN/exps_image.py:138-158)."""

    def _run(self, tmp_path, rng, extra=()):
        from vst_tpu.cli import experiments as cli_exps
        from vst_tpu.models import adaattn
        from vst_tpu.train.checkpoint import save_params

        cdir, sdir = str(tmp_path / "contents"), str(tmp_path / "styles")
        os.makedirs(cdir), os.makedirs(sdir)
        for i in range(2):
            _png(os.path.join(cdir, f"c{i}.png"), rng, (64, 64))
            _png(os.path.join(sdir, f"s{i}.png"), rng, (64, 64))
        weights = str(tmp_path / "ada.npz")
        save_params(adaattn.init_stylizing_network(0), weights)
        out = str(tmp_path / "results.csv")
        cli_exps.main(["image", "--contents", cdir, "--styles", sdir,
                       "--weights", weights, "--size", "64", "64",
                       "--out", out, *extra])
        import csv as csv_mod

        with open(out) as f:
            return list(csv_mod.DictReader(f))

    def test_schema_and_average_row(self, tmp_path, rng):
        rows = self._run(tmp_path, rng)
        # 2 contents × 2 styles + the average row
        assert len(rows) == 5
        assert rows[-1]["content"] == "average"
        cols = set(rows[0])
        for prefix in ("style", "content"):
            for m in ("ssim", "kl", "moment", "uniformity", "entropy"):
                assert f"{prefix}_{m}" in cols
        # no random-backbone gram columns without --vgg-weights
        assert not any(c.endswith("gram") for c in cols)
        # average row = column means of the data rows (exps_image.py:148-156)
        for c in cols - {"content", "style"}:
            vals = [float(r[c]) for r in rows[:-1]]
            np.testing.assert_allclose(float(rows[-1][c]), np.mean(vals),
                                       rtol=1e-6, err_msg=c)

    def test_gram_columns_with_vgg_weights(self, tmp_path, rng):
        from vst_tpu.models import vgg
        from vst_tpu.train.checkpoint import save_params

        vgg_w = str(tmp_path / "vgg19.npz")
        save_params(vgg.init_vgg19_adaattn(0), vgg_w)
        rows = self._run(tmp_path, rng, ("--vgg-weights", vgg_w))
        assert "style_gram" in rows[0] and "content_gram" in rows[0]

    @pytest.mark.slow
    def test_full_asset_matrix(self, tmp_path):
        """VERDICT r4 #8: the reference's exps_image_all is a 20×41 cross
        product (AdaAttN/exps_image_all.py:29-146); run OUR full committed
        asset matrix (6 contents × 9 procedural styles) with no limit so
        the first real-dataset run is not the first full-matrix execution.
        Asserts row count, average-row math over every column (incl. the
        gram columns), and runtime sanity."""
        import csv as csv_mod
        import time

        from vst_tpu.cli import experiments as cli_exps
        from vst_tpu.models import adaattn, vgg
        from vst_tpu.train.checkpoint import save_params

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cdir = os.path.join(repo, "assets", "contents")
        sdir = os.path.join(repo, "assets", "styles")
        n_c = len(os.listdir(cdir))
        n_s = len(os.listdir(sdir))
        assert (n_c, n_s) == (6, 9), "committed asset pack changed"

        weights = str(tmp_path / "ada.npz")
        save_params(adaattn.init_stylizing_network(0), weights)
        vgg_w = str(tmp_path / "vgg19.npz")
        save_params(vgg.init_vgg19_adaattn(0), vgg_w)
        out = str(tmp_path / "results_all.csv")
        t0 = time.monotonic()
        cli_exps.main(["image", "--contents", cdir, "--styles", sdir,
                       "--weights", weights, "--vgg-weights", vgg_w,
                       "--size", "64", "64", "--out", out])
        elapsed = time.monotonic() - t0
        with open(out) as f:
            rows = list(csv_mod.DictReader(f))
        assert len(rows) == n_c * n_s + 1
        assert rows[-1]["content"] == "average"
        # every (content, style) pair appears exactly once
        pairs = {(r["content"], r["style"]) for r in rows[:-1]}
        assert len(pairs) == n_c * n_s
        for c in set(rows[0]) - {"content", "style"}:
            vals = [float(r[c]) for r in rows[:-1]]
            np.testing.assert_allclose(float(rows[-1][c]), np.mean(vals),
                                       rtol=1e-6, err_msg=c)
        # runtime sanity: the matrix must amortize the one-shape compile —
        # 54 pairs through stylize+metrics should be minutes, not hours
        assert elapsed < 600, f"full matrix took {elapsed:.0f}s"


class TestExperimentsVideoCLI:
    def test_warping_error_runner(self, tmp_path, rng, capsys):
        """experiments video: chunked stylize + batched warping-error terms
        (AdaAttN/exps_video.py semantics) over a synthetic clip."""
        cv2 = pytest.importorskip("cv2")
        from vst_tpu.cli import experiments as cli_exp
        from vst_tpu.models import reconet
        from vst_tpu.train.checkpoint import save_params

        video = str(tmp_path / "in.avi")
        w, h, n = 64, 48, 7
        vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                             (w, h))
        base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        for i in range(n):
            vw.write(np.roll(base, 2 * i, axis=1))
        vw.release()
        weights = str(tmp_path / "w.npz")
        save_params(reconet.init_reconet(0), weights)
        cli_exp.main(["video", "--model", "reconet", "--weights", weights,
                      "--video", video, "--size", "64", "48",
                      "--platform", "cpu"])
        out = capsys.readouterr().out
        assert "Warping Error:" in out and "Flow MSE:" in out
        val = float(out.split("Warping Error:")[1].split()[0])
        assert np.isfinite(val) and val >= 0


class TestPreprocessCLI:
    def test_frames_then_flow(self, tmp_path, rng):
        """End-to-end offline preprocessing: videos → frames → fwd/bwd
        flow .npy (RTNSTV/datasets.py:16-85 pipeline as a CLI)."""
        import cv2

        from vst_tpu.cli import preprocess as cli_pre

        vdir = tmp_path / "videos"
        vdir.mkdir()
        w = cv2.VideoWriter(str(vdir / "a.avi"),
                            cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
        for _ in range(4):
            w.write((rng.random((48, 64, 3)) * 255).astype(np.uint8))
        w.release()
        out = str(tmp_path / "pre")
        cli_pre.main(["frames", "--videos", str(vdir), "--out", out,
                      "--size", "32", "24"])
        fdir = os.path.join(out, "frames", "00000")
        frames = sorted(os.listdir(fdir))
        assert len(frames) == 4
        img = Image.open(os.path.join(fdir, frames[0]))
        assert img.size == (32, 24)

        flow_out = str(tmp_path / "flow")
        cli_pre.main(["flow", "--frames", os.path.join(out, "frames"),
                      "--out", flow_out, "--engine", "farneback"])
        front = sorted(os.listdir(os.path.join(flow_out, "00000", "front")))
        back = sorted(os.listdir(os.path.join(flow_out, "00000", "back")))
        assert len(front) == 3 and len(back) == 3
        f = np.load(os.path.join(flow_out, "00000", "front", front[0]))
        assert f.shape == (24, 32, 2)
