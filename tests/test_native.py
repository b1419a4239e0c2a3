"""Native I/O library vs numpy readers (bit-equality)."""

import numpy as np
import pytest

from vst_tpu.data import flowio
from vst_tpu.data import native


@pytest.mark.skipif(not native.available(), reason="libvstio.so not built")
class TestNativeIO:
    def test_pfm_color(self, tmp_path, rng):
        img = rng.standard_normal((9, 13, 3)).astype(np.float32)
        path = str(tmp_path / "a.pfm")
        flowio.write_pfm(path, img)
        np.testing.assert_array_equal(native.read_pfm(path), img)

    def test_pfm_gray(self, tmp_path, rng):
        img = rng.standard_normal((6, 8)).astype(np.float32)
        path = str(tmp_path / "g.pfm")
        flowio.write_pfm(path, img)
        np.testing.assert_array_equal(native.read_pfm(path), img)

    def test_flo(self, tmp_path, rng):
        flow = rng.standard_normal((12, 17, 2)).astype(np.float32)
        path = str(tmp_path / "a.flo")
        flowio.write_flo(path, flow)
        np.testing.assert_array_equal(native.read_flo(path), flow)

    def test_batch_pfm(self, tmp_path, rng):
        paths = []
        ref = []
        for i in range(7):
            arr = rng.standard_normal((5, 6, 3)).astype(np.float32)
            p = str(tmp_path / f"{i}.pfm")
            flowio.write_pfm(p, arr)
            paths.append(p)
            ref.append(arr)
        out = native.read_flow_batch(paths, (5, 6, 3), num_threads=4)
        np.testing.assert_array_equal(out, np.stack(ref))

    def test_batch_flo(self, tmp_path, rng):
        paths = []
        ref = []
        for i in range(5):
            arr = rng.standard_normal((4, 7, 2)).astype(np.float32)
            p = str(tmp_path / f"{i}.flo")
            flowio.write_flo(p, arr)
            paths.append(p)
            ref.append(arr)
        out = native.read_flow_batch(paths, (4, 7, 2), num_threads=4)
        np.testing.assert_array_equal(out, np.stack(ref))

    def test_matches_numpy_reader(self, tmp_path, rng):
        img = rng.standard_normal((8, 9, 3)).astype(np.float32)
        path = str(tmp_path / "m.pfm")
        flowio.write_pfm(path, img)
        np.testing.assert_array_equal(native.read_pfm(path),
                                      flowio.read_pfm(path)[0])


class TestNativeVideo:
    """native/vstvideo.cc — MJPG AVI demux + thread-pool JPEG decode."""

    @pytest.fixture
    def mjpg_avi(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        path = str(tmp_path / "clip.avi")
        w, h, n = 160, 96, 11
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30,
                             (w, h))
        assert vw.isOpened()
        base = cv2.GaussianBlur(
            (rng.random((h, w, 3)) * 255).astype(np.uint8), (7, 7), 2)
        frames = [np.roll(base, i * 4, axis=1) for i in range(n)]
        for f in frames:
            vw.write(f[..., ::-1])  # RGB→BGR
        vw.release()
        return path, frames

    def test_open_and_dims(self, mjpg_avi):
        from vst_tpu.data import video_native

        if not video_native.available():
            pytest.skip("libvstvideo.so not built")
        path, frames = mjpg_avi
        with video_native.NativeMJPGVideo(path) as v:
            assert (v.n_frames, v.height, v.width) == (len(frames), 96, 160)

    def test_decode_matches_cv2(self, mjpg_avi):
        """Same bitstream through libjpeg vs cv2: identical frames up to
        JPEG-decoder variance (IDCT + chroma upsampling differences)."""
        cv2 = pytest.importorskip("cv2")
        from vst_tpu.data import video_native

        if not video_native.available():
            pytest.skip("libvstvideo.so not built")
        path, _ = mjpg_avi
        with video_native.NativeMJPGVideo(path, num_threads=4) as v:
            ours = list(v.frames(batch_size=4))
        cap = cv2.VideoCapture(path)
        theirs = []
        while True:
            ret, f = cap.read()
            if not ret:
                break
            theirs.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
        cap.release()
        assert len(ours) == len(theirs)
        for a, b in zip(ours, theirs):
            d = np.abs(a.astype(np.int32) - b.astype(np.int32))
            assert d.mean() < 4 and d.max() < 48, (d.mean(), d.max())

    def test_random_access_batch(self, mjpg_avi):
        from vst_tpu.data import video_native

        if not video_native.available():
            pytest.skip("libvstvideo.so not built")
        path, _ = mjpg_avi
        with video_native.NativeMJPGVideo(path) as v:
            all_frames = v.read_batch(0, v.n_frames)
            mid = v.read_batch(3, 4)
        np.testing.assert_array_equal(mid, all_frames[3:7])

    @staticmethod
    def _rewrite_as_avix(src_path, dst_path, split):
        """Re-pack an MJPG AVI's frame chunks as a two-segment OpenDML file:
        RIFF 'AVI ' holding frames [0, split) and a RIFF 'AVIX' extension
        segment holding the rest — the layout ffmpeg/OpenCV emit past ~1 GB
        (here at toy size, which only exercises the demuxer)."""
        data = open(src_path, "rb").read()
        frames = []

        def walk(pos, end):
            while pos + 8 <= end:
                fourcc = data[pos:pos + 4]
                size = int.from_bytes(data[pos + 4:pos + 8], "little")
                if fourcc in (b"RIFF", b"LIST"):
                    walk(pos + 12, min(end, pos + 8 + size))
                elif fourcc in (b"00dc", b"00db") and size > 0:
                    frames.append((pos + 8, size))
                pos += 8 + size + (size & 1)

        walk(12, 8 + int.from_bytes(data[4:8], "little"))
        assert split < len(frames)

        def movi(chunks):
            body = b""
            for off, size in chunks:
                body += (b"00dc" + size.to_bytes(4, "little")
                         + data[off:off + size])
                if size & 1:
                    body += b"\x00"
            return (b"LIST" + (4 + len(body)).to_bytes(4, "little")
                    + b"movi" + body)

        seg1 = movi(frames[:split])
        out = b"RIFF" + (4 + len(seg1)).to_bytes(4, "little") + b"AVI " + seg1
        if len(out) & 1:
            out += b"\x00"
        seg2 = movi(frames[split:])
        out += (b"RIFF" + (4 + len(seg2)).to_bytes(4, "little") + b"AVIX"
                + seg2)
        open(dst_path, "wb").write(out)
        return len(frames)

    def test_opendml_avix_segments(self, mjpg_avi, tmp_path):
        """Frames in OpenDML 'AVIX' extension RIFF segments are indexed, not
        silently dropped (large-file layout of ffmpeg/OpenCV writers)."""
        from vst_tpu.data import video_native

        if not video_native.available():
            pytest.skip("libvstvideo.so not built")
        path, frames = mjpg_avi
        avix = str(tmp_path / "avix.avi")
        n = self._rewrite_as_avix(path, avix, split=4)
        assert n == len(frames)
        with video_native.NativeMJPGVideo(path) as ref, \
                video_native.NativeMJPGVideo(avix) as v:
            assert v.n_frames == ref.n_frames == len(frames)
            np.testing.assert_array_equal(v.read_batch(0, v.n_frames),
                                          ref.read_batch(0, ref.n_frames))


    def test_truncated_avix_serves_leading_frames(self, mjpg_avi, tmp_path):
        """A truncated trailing AVIX segment (partial copy / killed writer)
        must not reject the file: frames indexed before the truncation
        point are served."""
        from vst_tpu.data import video_native

        path, frames = mjpg_avi
        avix = str(tmp_path / "trunc.avi")
        self._rewrite_as_avix(path, avix, split=4)
        # cut the file mid-way through the AVIX segment's chunk list
        data = open(avix, "rb").read()
        open(avix, "wb").write(data[:len(data) - 7])
        with video_native.NativeMJPGVideo(avix) as v:
            assert 4 <= v.n_frames < len(frames)
            got = v.read_batch(0, v.n_frames)
            assert got.shape[0] == v.n_frames
            assert got.any()  # decoded real pixels, not zeros

    def test_truncated_main_segment_serves_leading_frames(self, mjpg_avi,
                                                          tmp_path):
        """The SAME truncation inside the main RIFF segment (sub-1GB file,
        partial copy) must also serve the indexed prefix instead of
        rejecting the whole file with -3."""
        from vst_tpu.data import video_native

        if not video_native.available():
            pytest.skip("libvstvideo.so not built")
        path, frames = mjpg_avi
        trunc = str(tmp_path / "trunc_main.avi")
        data = open(path, "rb").read()
        # cut deep into the movi list (past any trailing idx1 index); the
        # RIFF size field still claims the full extent, so the chunk at the
        # cut is truncated mid-payload
        open(trunc, "wb").write(data[:int(len(data) * 0.6)])
        with video_native.NativeMJPGVideo(trunc) as v:
            assert 1 <= v.n_frames < len(frames)
            got = v.read_batch(0, v.n_frames)
            assert got.shape[0] == v.n_frames
            assert got.any()

    def test_close_during_read_is_safe(self, mjpg_avi):
        """vstvideo_close racing an in-flight read_batch must not crash
        (the handle table holds shared_ptrs; close defers destruction)."""
        import threading

        from vst_tpu.data import video_native

        if not video_native.available():
            pytest.skip("libvstvideo.so not built")
        path, _ = mjpg_avi
        for _ in range(5):
            v = video_native.NativeMJPGVideo(path, num_threads=4)
            t = threading.Thread(target=v.close)
            t.start()
            try:
                v.read_batch(0, v.n_frames)
            except IOError:
                pass  # close may win the race; only safety matters
            finally:
                t.join()
                v.close()

    def test_open_video_fallback_none(self, tmp_path):
        """Non-AVI input → None (caller falls back to cv2)."""
        from vst_tpu.data import video_native

        if not video_native.available():
            pytest.skip("libvstvideo.so not built")
        p = tmp_path / "not_a_video.avi"
        p.write_bytes(b"this is not RIFF data at all....")
        assert video_native.open_video(str(p)) is None


class TestNativeVideoLoader:
    def test_shipped_binary_without_source_is_fresh(self, tmp_path,
                                                    monkeypatch):
        """Binary-only deployments (no vstvideo.cc next to the .so) must
        load the shipped library rather than silently falling back to
        cv2."""
        from vst_tpu.data import video_native as vn

        so = tmp_path / "libvstvideo.so"
        so.write_bytes(b"\x7fELF-stub")
        monkeypatch.setattr(vn, "_LIB_PATH", str(so))
        monkeypatch.setattr(vn, "_SRC_PATH", str(tmp_path / "vstvideo.cc"))
        assert vn._fresh()

    def test_stale_binary_next_to_newer_source(self, tmp_path, monkeypatch):
        import os
        import time

        from vst_tpu.data import video_native as vn

        so = tmp_path / "libvstvideo.so"
        cc = tmp_path / "vstvideo.cc"
        so.write_bytes(b"x")
        cc.write_text("// newer")
        old = time.time() - 100
        os.utime(so, (old, old))
        monkeypatch.setattr(vn, "_LIB_PATH", str(so))
        monkeypatch.setattr(vn, "_SRC_PATH", str(cc))
        assert not vn._fresh()

    def test_missing_binary_not_fresh(self, tmp_path, monkeypatch):
        from vst_tpu.data import video_native as vn

        monkeypatch.setattr(vn, "_LIB_PATH", str(tmp_path / "nope.so"))
        monkeypatch.setattr(vn, "_SRC_PATH", str(tmp_path / "nope.cc"))
        assert not vn._fresh()
