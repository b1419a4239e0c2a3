"""Data layer tests: flow I/O round-trips, host transforms vs torch, dataset
index logic + samples over synthetic fixture trees, pipeline prefetch."""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

from vst_tpu.data import flowio
from vst_tpu.data.flow_np import (
    flow_warp_mask_np,
    resize_bilinear_np,
    warp_np,
)
from vst_tpu.data.datasets import (
    Coco2014,
    CocoWikiArt,
    FlyingThings3D,
    ImageFolderCrop,
    Monkaa,
    SceneFlowCombined,
    VidevoFlow,
    VidevoFrames,
    VidevoWikiArt,
)
from vst_tpu.data.pipeline import BatchLoader, device_prefetch


class TestFlowIO:
    def test_flo_round_trip(self, tmp_path, rng):
        flow = rng.standard_normal((12, 17, 2)).astype(np.float32)
        path = str(tmp_path / "a.flo")
        flowio.write_flo(path, flow)
        np.testing.assert_array_equal(flowio.read_flo(path), flow)
        np.testing.assert_array_equal(flowio.read(path), flow)

    def test_pfm_round_trip_color(self, tmp_path, rng):
        img = rng.standard_normal((9, 13, 3)).astype(np.float32)
        path = str(tmp_path / "a.pfm")
        flowio.write_pfm(path, img)
        out, scale = flowio.read_pfm(path)
        np.testing.assert_allclose(out, img, rtol=1e-6)
        assert scale == 1.0

    def test_pfm_round_trip_gray(self, tmp_path, rng):
        img = rng.standard_normal((9, 13)).astype(np.float32)
        path = str(tmp_path / "g.pfm")
        flowio.write_pfm(path, img)
        out, _ = flowio.read_pfm(path)
        np.testing.assert_allclose(out, img, rtol=1e-6)

    def test_pfm_as_flow_keeps_two_channels(self, tmp_path, rng):
        img = rng.standard_normal((6, 8, 3)).astype(np.float32)
        path = str(tmp_path / "f.pfm")
        flowio.write_pfm(path, img)
        assert flowio.read_flo(path).shape == (6, 8, 2)

    def test_sintel_flo(self, tmp_path, rng):
        flow = rng.standard_normal((5, 7, 2)).astype(np.float32)
        path = str(tmp_path / "s.flo")
        with open(path, "wb") as f:
            np.float32(202021.25).tofile(f)
            np.array([7, 5], np.int32).tofile(f)
            flow.tofile(f)
        np.testing.assert_array_equal(flowio.read_sintel_flo(path), flow)
        with pytest.raises(ValueError):
            bad = str(tmp_path / "bad.flo")
            with open(bad, "wb") as f:
                np.float32(1.0).tofile(f)
                np.array([7, 5], np.int32).tofile(f)
                flow.tofile(f)
            flowio.read_sintel_flo(bad)


class TestHostTransforms:
    def test_resize_matches_torch(self, rng):
        x = rng.standard_normal((20, 30, 3)).astype(np.float32)
        ours = resize_bilinear_np(x, (9, 14))
        ref = F.interpolate(
            torch.from_numpy(x.transpose(2, 0, 1))[None], size=(9, 14),
            mode="bilinear", align_corners=False,
        )[0].numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_mask_matches_device_op(self, rng):
        import jax.numpy as jnp
        from vst_tpu.ops import flow_warp_mask

        f01 = (rng.standard_normal((14, 18, 2)) * 3).astype(np.float32)
        f10 = (rng.standard_normal((14, 18, 2)) * 3).astype(np.float32)
        host = flow_warp_mask_np(f01, f10)
        dev = np.asarray(flow_warp_mask(jnp.asarray(f01), jnp.asarray(f10)))
        np.testing.assert_allclose(host, dev, atol=1e-5)

    def test_warp_matches_device_op(self, rng):
        import jax.numpy as jnp
        from vst_tpu.ops import warp

        x = rng.standard_normal((10, 12, 3)).astype(np.float32)
        flow = (rng.standard_normal((10, 12, 2)) * 2).astype(np.float32)
        host = warp_np(x, flow)
        dev = np.asarray(warp(jnp.asarray(x)[None], jnp.asarray(flow)[None]))[0]
        np.testing.assert_allclose(host, dev, atol=1e-4)


def _write_img(path, rng, size=(32, 24)):
    arr = (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def _write_gray(path, rng, size=(32, 24), zeros=False):
    arr = np.zeros((size[1], size[0]), np.uint8) if zeros else \
        (rng.random((size[1], size[0])) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def _make_sceneflow_scene(root, rng, n_frames=10, layout="monkaa"):
    """Create one synthetic SceneFlow-style scene."""
    if layout == "monkaa":
        f = os.path.join(root, "frames_finalpass", "sceneA", "left")
        o = os.path.join(root, "optical_flow", "sceneA")
        m = os.path.join(root, "motion_boundaries", "sceneA", "into_future",
                         "left")
    else:
        f = os.path.join(root, "frames_finalpass/TRAIN/A/0000", "left")
        o = os.path.join(root, "optical_flow/TRAIN/A/0000")
        m = os.path.join(root, "motion_boundaries/TRAIN/A/0000",
                         "into_future", "left")
    for d in (f, m, os.path.join(o, "into_future", "left"),
              os.path.join(o, "into_past", "left")):
        os.makedirs(d, exist_ok=True)
    if layout == "ft3d":
        for shard in ("B", "C"):
            for sub in ("frames_finalpass/TRAIN", "optical_flow/TRAIN",
                        "motion_boundaries/TRAIN"):
                os.makedirs(os.path.join(root, sub, shard), exist_ok=True)
    for i in range(n_frames):
        _write_img(os.path.join(f, f"{i:04d}.png"), rng)
        _write_gray(os.path.join(m, f"{i:04d}.png"), rng, zeros=True)
        for sub in ("into_future", "into_past"):
            flow = (rng.standard_normal((24, 32, 3)) * 2).astype(np.float32)
            flowio.write_pfm(
                os.path.join(o, sub, "left", f"{i:04d}.pfm"), flow)


class TestSceneFlowDatasets:
    @pytest.mark.parametrize("frame_num", [1, 3])
    def test_monkaa(self, tmp_path, rng, frame_num):
        _make_sceneflow_scene(str(tmp_path), rng, 10, "monkaa")
        ds = Monkaa(str(tmp_path), img_size=(24, 32), frame_num=frame_num)
        assert len(ds) == 10 - frame_num
        img1, img2, flow, mask = ds[0]
        assert img1.shape == (24, 32, 3 * frame_num)
        assert img2.shape == (24, 32, 3 * frame_num)
        assert flow.shape == (24, 32, 2)
        assert mask.shape == (24, 32)
        assert mask.min() >= 0 and mask.max() <= 1

    def test_flyingthings(self, tmp_path, rng):
        _make_sceneflow_scene(str(tmp_path), rng, 10, "ft3d")
        ds = FlyingThings3D(str(tmp_path), img_size=(24, 32))
        assert len(ds) == 9
        img1, img2, flow, mask = ds[3]
        assert img1.shape == (24, 32, 3)

    def test_combined(self, tmp_path, rng):
        mpath = str(tmp_path / "monkaa")
        fpath = str(tmp_path / "flyingthings3d")
        _make_sceneflow_scene(mpath, rng, 5, "monkaa")
        _make_sceneflow_scene(fpath, rng, 5, "ft3d")
        ds = SceneFlowCombined(str(tmp_path), img_size=(24, 32))
        assert len(ds) == 8
        assert ds[0][0].shape == (24, 32, 3)
        assert ds[5][0].shape == (24, 32, 3)


class TestVideoDatasets:
    def _make_videvo(self, root, rng, n=6, with_flow=True):
        fdir = os.path.join(root, "frames", "00000")
        os.makedirs(fdir, exist_ok=True)
        for i in range(n):
            _write_img(os.path.join(fdir, f"{i:05d}.jpg"), rng)
        if with_flow:
            front = os.path.join(root, "flow", "00000", "front")
            back = os.path.join(root, "flow", "00000", "back")
            os.makedirs(front, exist_ok=True)
            os.makedirs(back, exist_ok=True)
            for i in range(n - 1):
                np.save(os.path.join(front, f"{i:05d}_01.npy"),
                        rng.standard_normal((24, 32, 2)).astype(np.float32))
                np.save(os.path.join(back, f"{i + 1:05d}_10.npy"),
                        rng.standard_normal((24, 32, 2)).astype(np.float32))

    def test_videvo_flow(self, tmp_path, rng):
        self._make_videvo(str(tmp_path), rng)
        ds = VidevoFlow(str(tmp_path))
        assert len(ds) == 5
        img1, img2, flow, mask = ds[0]
        assert img1.shape == (24, 32, 3)
        assert flow.shape == (24, 32, 2)
        assert mask.shape == (24, 32)

    def test_videvo_frames(self, tmp_path, rng):
        self._make_videvo(str(tmp_path), rng, with_flow=False)
        ds = VidevoFrames(str(tmp_path))
        assert len(ds) == 5
        img1, img2 = ds[2]
        assert img1.shape == img2.shape == (24, 32, 3)

    def test_videvo_preprocessing_end_to_end(self, tmp_path, rng):
        """Full offline preprocessing chain (RTNSTV/datasets.py:16-85):
        raw video → get_frames → calculate_optical_flow → VidevoFlow."""
        cv2 = pytest.importorskip("cv2")
        from vst_tpu.data.datasets import calculate_optical_flow, get_frames

        w, h, n = 64, 48, 5
        vdir = os.path.join(str(tmp_path), "videos")
        os.makedirs(vdir)
        vw = cv2.VideoWriter(os.path.join(vdir, "clip.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 30, (w, h))
        base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        for i in range(n):
            vw.write(np.roll(base, i * 3, axis=1))
        vw.release()

        out = os.path.join(str(tmp_path), "videvo")
        get_frames(vdir, out, img_size_wh=(32, 24))
        frames = sorted(os.listdir(os.path.join(out, "frames", "00000")))
        assert len(frames) == n and frames[0] == "00000.jpg"

        calculate_optical_flow(os.path.join(out, "frames"),
                               os.path.join(out, "flow"))
        front = sorted(os.listdir(os.path.join(out, "flow", "00000",
                                               "front")))
        back = sorted(os.listdir(os.path.join(out, "flow", "00000", "back")))
        assert len(front) == len(back) == n - 1
        assert front[0] == "00000_01.npy" and back[0] == "00001_10.npy"
        flow = np.load(os.path.join(out, "flow", "00000", "front", front[0]))
        assert flow.shape == (24, 32, 2) and flow.dtype == np.float32

        ds = VidevoFlow(out)
        assert len(ds) == n - 1
        img1, img2, fl, mask = ds[0]
        assert img1.shape == img2.shape == (24, 32, 3)
        assert fl.shape == (24, 32, 2) and mask.shape == (24, 32)


class TestImageDatasets:
    def _make_folder(self, root, rng, n=4):
        os.makedirs(os.path.join(root, "cls"), exist_ok=True)
        for i in range(n):
            _write_img(os.path.join(root, "cls", f"{i}.jpg"), rng, (64, 48))

    def test_coco2014(self, tmp_path, rng):
        d = str(tmp_path / "train2014")
        os.makedirs(d)
        for i in range(3):
            _write_img(os.path.join(d, f"{i}.jpg"), rng)
        ds = Coco2014(str(tmp_path), img_size=(16, 16))
        assert len(ds) == 3
        assert ds[0].shape == (16, 16, 3)

    def test_image_folder_crop(self, tmp_path, rng):
        self._make_folder(str(tmp_path), rng)
        ds = ImageFolderCrop(str(tmp_path), size_resize=(32, 32),
                             size_crop=(16, 16))
        assert len(ds) == 4
        assert ds[0].shape == (16, 16, 3)

    def test_coco_wikiart(self, tmp_path, rng):
        self._make_folder(str(tmp_path / "coco"), rng)
        self._make_folder(str(tmp_path / "wiki"), rng)
        ds = CocoWikiArt(str(tmp_path / "coco"), str(tmp_path / "wiki"))
        c, s = ds[0]
        assert c.shape == s.shape == (256, 256, 3)

    def test_rng_thread_safety_and_reproducibility(self, tmp_path, rng):
        """Crop/style randomness must be identical for num_workers 0 vs 4
        (per-item derived generators, not a shared mutable one) and must
        vary across epochs via set_epoch."""
        self._make_folder(str(tmp_path / "coco"), rng, n=4)
        self._make_folder(str(tmp_path / "wiki"), rng, n=4)

        def run_epochs(num_workers, n_epochs=2):
            ds = CocoWikiArt(str(tmp_path / "coco"), str(tmp_path / "wiki"),
                             size_crop=(16, 16), seed=7)
            # shrink the AdaAttN 512 resize for test speed
            ds.coco.size_resize = ds.wikiart.size_resize = (64, 64)
            loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=3,
                                 num_workers=num_workers)
            return [[np.stack([c, s]) for c, s in zip(*b)]
                    for _ in range(n_epochs) for b in loader]

        serial = run_epochs(0)
        threaded = run_epochs(4)
        assert len(serial) == len(threaded) == 4
        for a, b in zip(serial, threaded):
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x, y)
        # epochs must differ (different crops / style picks)
        assert not all(
            np.array_equal(x, y)
            for x, y in zip(serial[0], serial[2]))

    def test_videvo_wikiart(self, tmp_path, rng):
        fdir = os.path.join(str(tmp_path / "videvo"), "frames", "00000")
        os.makedirs(fdir)
        for i in range(4):
            _write_img(os.path.join(fdir, f"{i:05d}.jpg"), rng)
        self._make_folder(str(tmp_path / "wiki"), rng)
        ds = VidevoWikiArt(str(tmp_path / "videvo"), str(tmp_path / "wiki"))
        c1, c2, s = ds[0]
        assert c1.shape == c2.shape == (24, 32, 3)
        assert s.shape == (256, 512, 3)


class TestPipeline:
    class _Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.full((4, 4, 3), i, np.float32),
                    np.full((4, 4), i, np.float32))

    def test_batch_loader(self):
        loader = BatchLoader(self._Toy(), batch_size=4, shuffle=True, seed=1)
        batches = list(loader)
        assert len(batches) == 2
        a, b = batches[0]
        assert a.shape == (4, 4, 4, 3) and b.shape == (4, 4, 4)

    def test_batch_loader_start_batch_is_exact_tail(self):
        """start_batch resumes the deterministic shuffle at the index
        level: the remaining batches equal the uninterrupted epoch's
        tail, and the skip costs no sample decodes."""
        full = list(BatchLoader(self._Toy(), batch_size=2, shuffle=True,
                                seed=7, num_workers=0))

        class Counting(self._Toy):
            calls = 0

            def __getitem__(inner, i):
                Counting.calls += 1
                return super().__getitem__(i)

        tail_loader = BatchLoader(Counting(), batch_size=2, shuffle=True,
                                  seed=7, num_workers=0, start_batch=3)
        tail = list(tail_loader)
        assert len(tail) == len(full) - 3
        assert Counting.calls == 2 * len(tail)  # skipped batches not decoded
        for (a1, b1), (a2, b2) in zip(full[3:], tail):
            np.testing.assert_array_equal(a1, a2)
            np.testing.assert_array_equal(b1, b2)
        # one-shot: a second iteration runs the full epoch again
        assert len(list(tail_loader)) == len(full)


    def test_device_prefetch(self):
        import jax.numpy as jnp

        loader = BatchLoader(self._Toy(), batch_size=2, shuffle=False,
                             num_workers=0)
        seen = list(device_prefetch(iter(loader), size=2))
        assert len(seen) == 5
        np.testing.assert_array_equal(
            np.asarray(seen[0][0][:, 0, 0, 0]), [0.0, 1.0])
        assert float(jnp.mean(seen[1][0])) == 2.5


class TestFlowVisualization:
    def test_visualize_flow(self, rng):
        """HSV flow viz (ReCoNet/utilities.py:28-36): BGR uint8, zero flow
        is black (zero magnitude -> zero value)."""
        cv2 = pytest.importorskip("cv2")
        from vst_tpu.data.flow_np import visualize_flow

        flow = rng.standard_normal((12, 16, 2)).astype(np.float32) * 4
        rgb = visualize_flow(flow)
        assert rgb.shape == (12, 16, 3) and rgb.dtype == np.uint8
        assert rgb.max() > 0

        black = visualize_flow(np.zeros((8, 8, 2), np.float32))
        assert black.max() == 0

    def test_visualize_dataset_tool(self, tmp_path, rng):
        """tools/visualize_dataset.py dumps frame/warp/mask/flow PNGs."""
        pytest.importorskip("cv2")
        import importlib.util
        import os as _os

        root = str(tmp_path / "sf")
        _make_sceneflow_scene(_os.path.join(root, "monkaa"), rng, 4,
                              "monkaa")
        spec = importlib.util.spec_from_file_location(
            "visualize_dataset",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), "tools",
                "visualize_dataset.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        out = str(tmp_path / "viz")
        mod.main(["--data", root, "--dataset", "monkaa", "--n", "2",
                  "--img-size", "24", "32", "--out", out])
        files = sorted(_os.listdir(out))
        assert "000_flow.png" in files and "001_warped_masked.png" in files
        assert len(files) == 12
